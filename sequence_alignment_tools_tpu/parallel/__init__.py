from .shard import make_mesh, sharded_scan_counts, shard_codes  # noqa: F401
