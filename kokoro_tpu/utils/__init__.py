"""Utils/infra layer: profiling, memory stats, cache management, misc helpers
(reference src/kokoro/utils/, SURVEY.md §2.6)."""
