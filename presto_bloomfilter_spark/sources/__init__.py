"""Sources: deterministic synthetic token corpus + testdata table loaders."""
