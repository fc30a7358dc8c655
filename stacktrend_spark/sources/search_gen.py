"""Randomized search-query generation (gdi:104-172), made deterministic.

The reference builds its trend-ingestion workload per run: 12 randomized
(category, sort, order, time-filter, star-floor) combinations plus 2
guaranteed high-quality queries, each fetching 3 random pages of the
first 5 (github_data_ingestion.py:104-172). It seeds nothing — every
run hits a different slice of the API.

This port keeps the exact workload shape (same pools, same 12+2 mix,
same 3-of-5 page sampling) but takes an explicit seed, so an ingestion
run is reproducible and testable. Generation is driver-side by nature
(it builds the REST request plan, ~14 requests ×3 pages — not data);
the fetched results flow through ``sources.rest.search_repositories``
/ ``fetch_distributed`` which do the distributed dedup + filtering.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

#: gdi:106-116
BASE_CATEGORIES = (
    "artificial-intelligence+machine-learning",
    "deep-learning+neural-networks+pytorch+tensorflow",
    "large-language-model+LLM+GPT+transformer",
    "data-engineering+ETL+data-pipeline+apache-spark",
    "web-development+framework+react+vue+angular",
    "devops+kubernetes+docker+containerization",
    "database+SQL+NoSQL+postgresql+mongodb",
    "security+cybersecurity+authentication",
    "python+golang+rust+java+cpp",
    "javascript+typescript+node+frontend",
)

#: gdi:119-125
SORT_STRATEGIES = (
    ("stars", "desc"),
    ("updated", "desc"),
    ("created", "desc"),
    ("forks", "desc"),
    ("help-wanted-issues", "desc"),
)

#: gdi:128-134
TIME_FILTERS = (
    "pushed:>2024-06-01",
    "pushed:>2024-01-01",
    "pushed:>2023-01-01",
    "created:>2024-01-01",
    "created:>2023-01-01",
)

#: gdi:143
STAR_FLOORS = (1000, 1500, 2000, 5000)

N_RANDOMIZED = 12  # gdi:139
PAGE_POOL = range(1, 6)  # gdi:170 — first 5 pages
PAGES_PER_QUERY = 3  # gdi:170 — sample 3 of them


@dataclass(frozen=True)
class SearchQuery:
    query: str
    sort: str
    order: str
    pages: tuple[int, ...]
    guaranteed: bool


def randomized_search_queries(seed: int) -> list[SearchQuery]:
    """The reference's 12-random + 2-guaranteed query mix (gdi:104-156),
    with page selection (gdi:170) folded in, fully determined by
    ``seed``. Draw order matches the reference loop: per query
    category → sort → time filter → star floor, then pages."""
    rng = random.Random(seed)
    out: list[SearchQuery] = []
    for _ in range(N_RANDOMIZED):
        category = rng.choice(BASE_CATEGORIES)
        sort_field, sort_order = rng.choice(SORT_STRATEGIES)
        time_filter = rng.choice(TIME_FILTERS)
        star_min = rng.choice(STAR_FLOORS)
        q = f"{category}+stars:>{star_min}+{time_filter}"
        pages = tuple(sorted(rng.sample(list(PAGE_POOL), PAGES_PER_QUERY)))
        out.append(SearchQuery(q, sort_field, sort_order, pages, guaranteed=False))
    # gdi:150-154 — always-included high-quality queries
    for q, sort_field, sort_order in (
        ("stars:>10000+created:>2023-01-01", "stars", "desc"),
        ("stars:>5000+updated:>2024-06-01", "updated", "desc"),
    ):
        pages = tuple(sorted(rng.sample(list(PAGE_POOL), PAGES_PER_QUERY)))
        out.append(SearchQuery(q, sort_field, sort_order, pages, guaranteed=True))
    return out
