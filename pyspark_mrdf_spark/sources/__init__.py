"""Binary vector-file connectors (fvecs/ivecs) and graph sinks."""
