"""Large-scale LLM-data-pipeline operators: dedup, similarity, text analysis,
multimodal plumbing. These extend the reference's exact-dedup core
(sms-db.pl:318-339, README.md:113-115) with the fuzzy/approximate family a
100TB training-data pipeline needs (BASELINE.json north_star)."""
