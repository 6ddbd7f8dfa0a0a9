"""Controller stack: pure-functional gait / planners / MPC / WBC / estimator."""
