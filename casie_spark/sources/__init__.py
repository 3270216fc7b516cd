"""Sources & sinks: documents, gold annotations, graph tables."""
