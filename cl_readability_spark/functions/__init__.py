"""DataFrame-level twins of SQL-expressible sub-operators + training-data
text ops (SURVEY §5 layer 4 / FIXTURES.md §C)."""
