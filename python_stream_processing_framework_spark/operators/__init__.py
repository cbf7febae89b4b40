"""Engine operators: windows, routing, joins, dedup, similarity, text, multimodal."""
