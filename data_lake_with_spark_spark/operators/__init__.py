"""Reusable DataFrame→DataFrame operators (dedup, similarity search,
multimodal plumbing). Each is a pure plan transformation — no actions,
no collects — so callers compose them and Catalyst optimizes across the
boundary."""
