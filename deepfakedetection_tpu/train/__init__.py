"""Training subsystem: one shared trainer driven by per-model TrainRecipes."""
