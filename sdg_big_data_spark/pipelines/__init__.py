"""Composed domain workloads — the three pipelines the reference ships
(`SURVEY.md` §0), rebuilt as thin compositions of the engine's operators:

- :mod:`mobility` — GPS pings → stops → geocode → home/work labels →
  duration panels → mobility indicators (gps-analytics).
- :mod:`labor` — tweet corpus → dedup/sample → model scoring → ranked
  retrieval → monthly labor-market indicators (twitter-analytics).
- :mod:`news` — articles → dictionary sentiment → daily country panels →
  z-scores → global factor (news-analytics).
"""

from . import dataprep, labor, mobility, news  # noqa: F401
