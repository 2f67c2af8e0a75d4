"""Host-side utilities: weight loading, tokenization, logging, metrics."""
