"""Shared infrastructure: TSV writers, logging, progress, caching."""
