"""Logical-plan builders: the BI view layer and the raw→core pipeline."""
