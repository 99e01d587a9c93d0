"""Live-query subscriptions + Structured Streaming integration."""
