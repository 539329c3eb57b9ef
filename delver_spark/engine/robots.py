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


def crawl_delay(body: str | None) -> float | None:
    """``Crawl-delay`` (seconds) for the ``*`` agent, or None when
    absent/malformed/non-positive. NOT a reference capability (the
    reference's robotstxt.go never reads it) — this is the engine's own
    politeness input, per the widely-honored non-RFC convention (Bing/
    Yandex; RFC 9309 leaves the directive undefined). Group rule
    matches :func:`parse_robots` (only the ``User-agent: *`` group
    applies); the LAST directive in an applying group wins, matching a
    sequential read."""
    if not body:
        return None
    delay = None
    applies = False
    try:
        for raw in body.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                applies = val == "*"
            elif key == "crawl-delay" and applies:
                try:
                    d = float(val)
                except ValueError:
                    continue
                if d > 0:
                    delay = d
    except Exception:
        return None
    return delay


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


class RobotsCache:
    """Per-host robots cache with TTL measured in ROUND AGE — the engine
    mapping of the reference's memoryRobots 1-hour expiry
    (frontier/robotstxt.go:17-47, config.go:113-116; SURVEY §4.1 maps
    wall-clock TTL → crawl-round age).

    The robots source is VERSIONED: ``versions`` holds (host, body,
    from_round) rows and the body effective at round r is the latest
    version with ``from_round <= r`` — how a static corpus models
    robots.txt changing mid-crawl.

    Modes (the reference's clearExpired sweep has an INVERTED predicate —
    robotstxt.go:126-147 collects keys where ``created+expiration >
    now``, i.e. it deletes the FRESH entries and retains expired ones
    forever; VERDICT r1 asked for a deliberate decision + test):

    - ``ttl_rounds=None`` (default): load once on first use, never
      refresh — the static-per-run behavior every existing corpus uses.
    - ``ttl_rounds=k``: CORRECT expiry — an entry loaded at round r is
      reloaded on first use at round >= r+k. This is the engine default
      when a TTL is configured, chosen over the reference's buggy sweep.
    - ``quirk_inverted_sweep=True``: reference-faithful bug mode — each
      round the sweep deletes entries YOUNGER than the TTL (they reload
      on next use) and retains expired ones forever, so a robots change
      never reaches a host loaded before it. Pinned by
      tests/test_robots_ttl.py as documentation of the reference bug.
    """

    def __init__(self, versions, ttl_rounds: int | None = None,
                 quirk_inverted_sweep: bool = False):
        self.by_host: dict[str, list[tuple[int, str]]] = {}
        for host, body, from_round in versions:
            self.by_host.setdefault(host, []).append((int(from_round), body))
        for v in self.by_host.values():
            v.sort()
        self.ttl = ttl_rounds
        self.quirk = quirk_inverted_sweep
        # host -> (rules, loaded_round)
        self.cache: dict[str, tuple[list, int]] = {}
        # the reference sweep is a timer with period clearExpiredDelay ==
        # expiration (config.go:113-116): mapped to one sweep per TTL
        # rounds, fired before the first use in each TTL window
        self._sweeps_done = 0

    def _effective_body(self, host: str, rnd: int) -> str | None:
        body = None
        for from_round, b in self.by_host.get(host, []):
            if from_round <= rnd:
                body = b
        return body

    def _sweep(self, rnd: int):
        if self.ttl is None:
            return
        if self.quirk:
            # timer-cadence sweep with the inverted predicate
            # (robotstxt.go:135-139): collect the entries whose
            # created+expiration is still in the future — the FRESH ones —
            # and delete those (they reload with current content on next
            # use: an accidental EARLY refresh); expired entries survive
            # forever, so changes never reach them
            while (self._sweeps_done + 1) * self.ttl <= rnd:
                self._sweeps_done += 1
                tick = self._sweeps_done * self.ttl
                doomed = [h for h, (_, loaded) in self.cache.items()
                          if loaded + self.ttl > tick]
                for h in doomed:
                    del self.cache[h]
        else:
            # correct expiry on read: reload anything at or past TTL age
            doomed = [h for h, (_, loaded) in self.cache.items()
                      if loaded + self.ttl <= rnd]
            for h in doomed:
                del self.cache[h]

    def rules_for_round(self, rnd: int) -> dict[str, list]:
        """Load-through snapshot of every known host's rules as of round
        ``rnd`` (refill gates the whole candidate set at once, so the
        full-dict view is the natural engine unit — it is what the
        engine broadcasts)."""
        self._sweep(rnd)
        out: dict[str, list] = {}
        for host in self.by_host:
            ent = self.cache.get(host)
            if ent is None:
                rules = parse_robots(self._effective_body(host, rnd))
                self.cache[host] = (rules, rnd)
                out[host] = rules
            else:
                out[host] = ent[0]
        return out


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
