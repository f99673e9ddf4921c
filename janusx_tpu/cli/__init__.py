"""`jx` command-line interface."""
