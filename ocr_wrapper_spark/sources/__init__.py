"""Sources & sinks: synthetic page generation, cache table, metrics table."""
