"""Sources: deterministic synthetic generators + driver-testdata readers."""
