"""Column-expression libraries (pure functions over Columns)."""
