"""In-graph physics simulation + device facade (PyBullet replacement)."""
