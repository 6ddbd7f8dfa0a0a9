"""qrw_tpu — TPU-native reactive walking framework for the Solo-12 quadruped.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
paLeziart/quadruped-reactive-walking (reference mounted read-only at
/root/reference): a 500 Hz reactive walking controller — joystick velocity
command -> state estimator -> gait scheduler -> Raibert footstep planner ->
base reference trajectory -> centroidal convex MPC -> swing-foot polynomial
trajectories -> whole-body controller (leg IK + contact-force box QP) ->
feedforward torques + joint PD setpoints -> simulator device.

Architecture (TPU-first, NOT a port):
  * every reference C++/Python class with mutable state becomes a pure
    function over an explicit state pytree, jit/vmap-able over thousands of
    independent robot scenarios;
  * the reference's sparse-CSC + OSQP machinery is replaced by a *condensed*
    dense QP (states eliminated analytically) solved by a batched ADMM kernel
    with OSQP update semantics (sigma/alpha/adaptive-rho);
  * Pinocchio is replaced by hand-written spatial-algebra rigid-body kernels
    specialized for the Solo-12 topology;
  * PyBullet is replaced by an in-graph compliant-contact physics simulator
    so whole closed-loop rollouts run on-device;
  * scaling is by scenario batch over a `jax.sharding.Mesh` (DP over ICI/DCN),
    not by processes + shared memory.

Layer map (mirrors SURVEY.md section 1):
  ops/       low-level kernels: rotations, rigid-body dynamics, QP solvers
  models/    robot model constants (Solo-12)
  core/      controller stack: gait, planners, MPC, WBC, estimator, joystick
  sim/       in-graph physics simulator + device facade (PyBullet replacement)
  parallel/  mesh / shard_map scenario scale-out
  utils/     logging, replay, plotting
  runtime/   native C++ host runtime (real-time pacing, mailboxes)
"""

__version__ = "0.1.0"
