"""Scale-extension operators: dedup, similarity search, text analysis,
multimodal plumbing, recursive-CTE emulation."""
