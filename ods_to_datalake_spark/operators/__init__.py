"""Relational/dataflow operators (SURVEY §2) as named, reusable, tested units."""
