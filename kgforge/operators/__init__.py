"""Spark DataFrame operators of the kgforge pipeline (SURVEY.md section 2)."""
