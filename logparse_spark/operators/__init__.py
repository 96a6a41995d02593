"""Pipeline operators (P4-P9) plus the training-data operator suite
(dedup, similarity, text analysis, multimodal plumbing)."""
