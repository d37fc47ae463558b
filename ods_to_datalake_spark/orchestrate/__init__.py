"""Driver-side job orchestration (SURVEY §2.10 O1-O7)."""
