"""Data pipeline: Russian G2P front-end, MFA duration alignment, feature
extraction + on-disk cache, and bucketed static-shape batching."""
