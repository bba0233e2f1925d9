"""Query plans: the driver-checkable query repertoire."""
