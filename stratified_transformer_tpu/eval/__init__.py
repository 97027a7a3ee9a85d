"""Evaluation: whole-scene voxel-vote inference, TTA, instance post-proc."""
