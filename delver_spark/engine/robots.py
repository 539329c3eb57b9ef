"""robots.txt parsing and path matching.

Capability parity with the reference's memoryRobots
(/root/reference/frontier/robotstxt.go:49-124, temoto/robotstxt semantics
for the corpus subset):

  - only the ``User-agent: *`` group applies (corpus robots use ``*``);
  - Allow/Disallow are path prefixes; the LONGEST matching rule wins;
  - tie between Allow and Disallow of equal length → Allow wins;
  - no matching rule → allowed;
  - missing, empty, or malformed robots body → allow everything
    (reference allows on fetch/parse failure, robotstxt.go:59-70).

``parse_robots`` returns a compact rule list suitable for broadcasting;
``allowed_batch`` is vectorized over a pandas/numpy batch of paths.
"""

from __future__ import annotations

import numpy as np


def parse_robots(body: str | None) -> list[tuple[bool, str]]:
    """→ [(allow, prefix), ...] for the '*' agent; [] means allow-all."""
    if not body:
        return []
    rules: list[tuple[bool, str]] = []
    applies = False
    saw_any_agent = False
    try:
        for raw in body.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                saw_any_agent = True
                applies = val == "*"
            elif key in ("allow", "disallow") and applies:
                if val:
                    rules.append((key == "allow", val))
                # empty Disallow means allow-all: no rule appended
        if not saw_any_agent:
            # malformed robots (no agent line) → allow on parse failure
            return []
    except Exception:
        return []
    return rules


def allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    if not rules:
        return True
    if path == "":
        path = "/"
    best_len = -1
    best_allow = True
    for allow, prefix in rules:
        if path.startswith(prefix):
            plen = len(prefix)
            if plen > best_len or (plen == best_len and allow and not best_allow):
                best_len = plen
                best_allow = allow
    return best_allow if best_len >= 0 else True


def allowed_batch(rules_by_host: dict[str, list[tuple[bool, str]]], hosts, paths) -> np.ndarray:
    """Vectorized-ish batch check (rule sets are tiny; grouped by host)."""
    hosts = np.asarray(hosts, dtype=object)
    paths = np.asarray(paths, dtype=object)
    out = np.ones(len(hosts), dtype=bool)
    # group rows by host so each host's rule list is fetched once
    order = np.argsort(hosts, kind="stable")
    i = 0
    n = len(hosts)
    while i < n:
        j = i
        h = hosts[order[i]]
        while j < n and hosts[order[j]] == h:
            j += 1
        rules = rules_by_host.get(h, [])
        if rules:
            for idx in order[i:j]:
                out[idx] = allowed(rules, paths[idx])
        i = j
    return out
