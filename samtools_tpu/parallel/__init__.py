"""Mesh/sharding helpers: device meshes, sharded reductions, region shards."""
