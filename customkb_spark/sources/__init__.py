"""File-system sources: glob scan, binary read, encoding-aware decode."""
