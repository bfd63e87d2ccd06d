"""Sources & sinks: table catalog helpers + the lineage checkpoint store."""
