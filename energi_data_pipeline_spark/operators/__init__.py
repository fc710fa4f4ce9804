"""Relational + extension operators, all DataFrame-native."""
