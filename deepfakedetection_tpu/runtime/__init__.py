"""Runtime services: run directories, logging, seeding, checkpointing."""
