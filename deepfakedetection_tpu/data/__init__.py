"""Data layer: folder scan, transform plans, host decode, device augmentation."""
