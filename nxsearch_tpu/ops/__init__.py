"""Device (TPU) compute ops: scoring, boolean masks, fuzzy matching."""
