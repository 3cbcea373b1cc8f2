"""tokforge — PySpark-native streaming token-transform engine."""
