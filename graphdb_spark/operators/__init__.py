"""Custom operators beyond plain DataFrame composition: traversals,
mutations, temporal replay, dedup, similarity search, text analysis,
multimodal plumbing."""
