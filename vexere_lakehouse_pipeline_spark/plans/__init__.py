"""Query plans: the reference's 8 gold analytics (domain form in
``gold``), their engine-correctness analogs over the driver star
schema (``star``), and TPC-H-style headline queries (``star`` too)."""
