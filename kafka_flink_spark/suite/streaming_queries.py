"""Streaming parity queries: Structured Streaming pipelines replayed
over the events fixture with availableNow triggers, compared against
batch SQL oracles. Populated by streaming/*."""
