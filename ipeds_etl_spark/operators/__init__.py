"""Relational + training-data operators built on DataFrame primitives."""
