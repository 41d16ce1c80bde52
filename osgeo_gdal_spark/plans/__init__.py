"""Pipeline composition, checkpointing and lineage."""
