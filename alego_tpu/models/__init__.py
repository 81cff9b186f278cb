"""Pipeline stages (the "model" layer): image projection, laser odometry,
laser mapping, pose graph, loop closure, and the full SLAM pipeline."""
