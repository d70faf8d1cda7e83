"""Engine operators: tokenize, identify/report, sampling, ordering,
skew handling, dedup, similarity — each a declarative DataFrame→DataFrame
transform that Catalyst can optimize through."""
