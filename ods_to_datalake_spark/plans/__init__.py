"""Declarative query plans: the reference pipeline rebuilt on engine
operators, plus the full oracle-checked query suite over the testdata
tables (SURVEY §2 inventory + LLM-pipeline extensions)."""
