"""Sources & sinks (SURVEY §2.1)."""
