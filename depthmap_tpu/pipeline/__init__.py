"""Pipeline layer: preprocessing, depth prediction, and the generation
funnel that fans a depth map out into all derived outputs."""
