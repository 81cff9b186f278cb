"""Multi-device scale-out: meshes, sharded front-end, distributed pose graph."""
