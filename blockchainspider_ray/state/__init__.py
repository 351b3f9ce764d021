"""Shared mutable engine state: URL-seen filter shards, checkpoints."""
