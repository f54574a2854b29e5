"""Pipeline composition, metrics, and DuckDB-oracle SQL builders."""
