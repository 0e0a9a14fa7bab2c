"""CPU oracle tracer (golden reference for tests)."""
