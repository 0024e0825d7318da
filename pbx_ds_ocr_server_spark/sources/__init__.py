"""Sources & sinks: table loaders and the checkpointed resumable writer."""
