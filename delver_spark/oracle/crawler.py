"""Single-threaded pure-Python reference oracle (SURVEY §2.5, §5.2-2).

This is the executable definition of "reference crawl order": the
deterministic serialization of delver's dfs_basic pipeline —

  round loop:
    refill when frontier empty (worker/publisher/dfs_basic.go:80-183,
      lexicographic domain + url order per SURVEY O4/O5; robots-checked,
      0-publish domains retained — reference keeps dirs that publish 0)
    dequeue under (per_host_budget, global_budget) in
      (priority, enqueue_round, enqueue_seq) order (queue/file.go:250-280
      alphabetized-filename order made deterministic; politeness budget per
      BASELINE.json north_rule)
    per fetched page, in dequeue order:
      mark visited in bloom BEFORE link handling
        (worker/accumulator/dfs_basic.go:48,61-65)
      outlinks = FSM extract → first-occurrence dedupe on raw → resolve
        (extractors/url.go:26-35) → canonicalize (engine spec, SURVEY §1.5)
      same sld_tld + depth < max_depth → enqueue unless bloom-positive
        (dfs_basic.go:87-99); enqueued batch SetMany'd after the page
        (dfs_basic.go:121-123)
      different sld_tld → stash url_store[domain][url] = origin
        (dfs_basic.go:100-118; Badger Set overwrites → last-wins)

The Spark engine must reproduce ``crawl_order`` (list equality) and the
bloom bitmap (bit positions equality) exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..engine.cuckoo import ShardedCuckoo
from ..engine.extract_ref import extract_outlinks
from ..engine.rolling_bloom import RollingBloomFilter
from ..engine.murmur import hash128
from ..engine.robots import RobotsCache, allowed
from ..engine.urlnorm import canonicalize, host_of, path_of, sld_tld


@dataclass
class Page:
    url: str
    caption: str
    host: str


@dataclass
class FrontierEntry:
    priority: int
    enqueue_round: int
    enqueue_seq: int
    url: str  # canonical
    depth: int
    origin: str


@dataclass
class CrawlResult:
    crawl_order: list[dict] = field(default_factory=list)
    lineage: list[dict] = field(default_factory=list)
    documents: list[dict] = field(default_factory=list)
    quarantine: list[dict] = field(default_factory=list)
    bloom: RollingBloomFilter | None = None
    cuckoo: ShardedCuckoo | None = None
    rounds: int = 0


def partition_of(host: str, n_partitions: int) -> int:
    """Deterministic partition id used for lineage counters (same formula on
    the Spark side): murmur3 upper-half of the host mod n_partitions."""
    return int(hash128(host.encode())[0] % n_partitions)


class OracleCrawler:
    def __init__(self, pages: dict[str, Page], robots_bodies: dict[str, str],
                 seeds: list[tuple[str, int]], *, max_depth: int = 3,
                 per_host_budget: int = 4, global_budget: int = 64,
                 max_rounds: int = 200, bloom_max_n: int = 100000,
                 bloom_p: float = 0.01, n_partitions: int = 8,
                 bloom_count: int = 1,
                 robots_ttl_rounds: int | None = None,
                 poison_urls: set[str] | None = None,
                 mode: str = "dfs",
                 seen_filter: str = "bloom",
                 cuckoo_shards: int = 4,
                 cuckoo_capacity: int | None = None,
                 host_budgets: dict | None = None):
        # host_budgets: per-host dequeue-budget OVERRIDES (e.g. from
        # robots Crawl-delay via frontier.budgets_from_crawl_delay) —
        # host h's per-round cap is host_budgets.get(h, B); 0 blocks
        # the host. NOT a reference capability (the reference has no
        # per-host rate limit at all, SURVEY O2); part of the engine's
        # own politeness story, so the oracle carries the same knob and
        # the engine≡oracle equality covers it.
        self.host_budgets = host_budgets or {}
        self.pages = pages
        # robots_bodies: {host: body} (static) or [(host, body, from_round)]
        # versioned rows; TTL measured in round age (robotstxt.go mapping)
        versions = [(h, b, 0) for h, b in robots_bodies.items()] \
            if isinstance(robots_bodies, dict) else list(robots_bodies)
        self.robots = RobotsCache(versions, ttl_rounds=robots_ttl_rounds)
        self.seeds = seeds
        self.max_depth = max_depth
        self.B = per_host_budget
        self.G = global_budget
        self.max_rounds = max_rounds
        self.n_partitions = n_partitions
        # the seen-set resource is the reference's ROLLING bloom
        # (rolling_bloom.go): writes return errors that dfs_basic logs and
        # ignores; rotation + the lost-insert quirk live inside the filter.
        # seen_filter="cuckoo" swaps in the deletion-capable sharded cuckoo
        # (engine/cuckoo.py — the north star's named alternative, NOT a
        # reference structure). Its semantics are defined HERE as the spec
        # the engine must match: the round-snapshot probe contract is
        # unchanged, and the round's insert SET {markVisited'd pages ∪
        # admitted urls} (admitted only in news mode) commits at round END
        # in canonical per-shard sorted-unique (i1, fp) order — order-free
        # by construction, so the distributed engine's filter is
        # bit-identical without replaying the reference's per-op sequence.
        # (Equivalent for probes: no probe reads the live filter mid-round
        # in either seen mode.)
        assert seen_filter in ("bloom", "cuckoo")
        self.seen_filter = seen_filter
        self.bloom = RollingBloomFilter(bloom_count, bloom_max_n, bloom_p)
        self.cuckoo = ShardedCuckoo.empty(
            cuckoo_shards, cuckoo_capacity or bloom_max_n) \
            if seen_filter == "cuckoo" else None
        self._res: CrawlResult | None = None
        self._rnd = 0
        self.frontier: list[FrontierEntry] = []
        self.url_store: dict[str, dict[str, str]] = {}
        self.seq = 0
        self.fetch_seq = 0
        # urls whose extraction "crashes": the reference routes the whole
        # message to the DLQ dir (queue/file.go:167-204) BEFORE the
        # accumulator runs — fetched (crawl_order row) but no markVisited,
        # no document, no outlinks
        self.poison_urls = poison_urls or set()
        # "dfs": dfs_basic accumulator (same-domain gate, stash, refill).
        # "news": news accumulator (news.go OnMessage) — exact-host +
        # news_url_allowed gates WITH robots checked per outlink at
        # admission, bloom marks ADMITTED urls only (the fetched page is
        # never markVisited'd — news.go has no such call), no stash/refill,
        # maxDepth=1, and articles = fetched pages with depth > 0
        # (processArticle skips depth 0).
        assert mode in ("dfs", "news")
        self.mode = mode

    # -- frontier ops ---------------------------------------------------------
    def _enqueue(self, url: str, depth: int, origin: str, rnd: int, priority: int = 0):
        self.frontier.append(FrontierEntry(priority, rnd, self.seq, url, depth, origin))
        self.seq += 1

    def _refill(self, rnd: int) -> int:
        """dfs_basic publisher semantics: first (lexicographic) stashed
        domain with >0 robots-allowed urls; publish them in url order at
        depth 0; delete that domain; 0-publish domains are retained."""
        rules_by_host = self.robots.rules_for_round(rnd)
        for domain in sorted(self.url_store):
            published = 0
            for u in sorted(self.url_store[domain]):
                host = host_of(u)
                if not allowed(rules_by_host.get(host, []), path_of(u)):
                    continue
                self._enqueue(u, 0, self.url_store[domain][u], rnd)
                published += 1
            if published:
                del self.url_store[domain]
                return published
        return 0

    def _dequeue(self) -> list[FrontierEntry]:
        self.frontier.sort(key=lambda e: (e.priority, e.enqueue_round, e.enqueue_seq))
        taken: list[FrontierEntry] = []
        per_host: dict[str, int] = {}
        rest: list[FrontierEntry] = []
        for e in self.frontier:
            host = host_of(e.url)
            cap = self.host_budgets.get(host, self.B)
            if len(taken) < self.G and per_host.get(host, 0) < cap:
                taken.append(e)
                per_host[host] = per_host.get(host, 0) + 1
            else:
                rest.append(e)
        self.frontier = rest
        return taken

    # -- news accumulator page handler (news.go OnMessage) --------------------
    def _news_page(self, e, success, rnd, snap_probe, admitted_this_round,
                   rules_by_host, c, res, round_inserts):
        """processUrls + processArticle (news.go:100-130,152-290): gates
        applied in urlAllowed's order — exact host, extension blacklist,
        robots (checked PER OUTLINK at admission, unlike dfs's
        refill-time check), looks-like-article, ':'+'=', seen bloom —
        then the admitted url is marked seen IMMEDIATELY (SetBytes inside
        urlAllowed), so within-page duplicates are deduped, unlike the
        dfs same-page quirk. The fetched page itself is never marked."""
        from ..functions.news import (
            BLACKLISTED_EXTENSIONS,
            NEWS_MAX_DEPTH,
            _looks_like_article_py,
        )
        if not success:
            return
        if e.depth > 0:
            # processArticle: depth-0 pages are skipped (news.go:153-155)
            res.documents.append({"url_canon": e.url, "depth": e.depth,
                                  "round": rnd, "host": host_of(e.url)})
        if e.depth >= NEWS_MAX_DEPTH:
            return
        page = self.pages[e.url]
        origin_host = host_of(e.url)
        for link in extract_outlinks(e.url, page.caption.encode()):
            lc = canonicalize(link)
            if lc is None:
                continue
            lhost = host_of(lc)
            if lhost != origin_host:
                continue
            path = path_of(lc)
            if any(path.endswith(x) for x in BLACKLISTED_EXTENSIONS):
                continue
            if not allowed(rules_by_host.get(lhost, []), path):
                continue
            if not _looks_like_article_py(path):
                continue
            if ":" in path and "=" in path:
                continue
            if lc in admitted_this_round or snap_probe(lc):
                c["deduped"] += 1
                continue
            self._enqueue(lc, e.depth + 1, e.url, rnd)
            if self.seen_filter == "bloom":
                self.bloom.add(lc)
            else:
                round_inserts.append(lc)
            admitted_this_round.add(lc)
            c["enqueued"] += 1

    # -- main loop --------------------------------------------------------------
    def _seed_once(self):
        """Idempotent seeding — run() and readmit() both go through it,
        so seeds always take the FIRST seq numbers even when readmit is
        (unusually) called before the first run."""
        if self._res is not None:
            return
        self._res = CrawlResult()
        for s in self.seeds:
            # (url, priority[, depth[, origin]]) — depth/origin let RSS
            # FetcherRequests (depth 1, origin=feed) seed a news crawl
            url, priority = s[0], s[1]
            depth = int(s[2]) if len(s) > 2 else 0
            origin = s[3] if len(s) > 3 else ""
            c = canonicalize(url)
            if c is not None:
                self._enqueue(c, depth, origin, 0, priority)

    def run(self) -> CrawlResult:
        """Run rounds until exhaustion or max_rounds. Re-callable: a
        second call CONTINUES the same crawl (state lives on self; the
        accumulated CrawlResult is returned again) — the recrawl story:
        run() → :meth:`readmit` → run()."""
        self._seed_once()
        res = self._res
        rnd = self._rnd

        while rnd < self.max_rounds:
            if not self.frontier:
                if self._refill(rnd) == 0:
                    break
            batch = self._dequeue()
            if not batch:
                break
            counters: dict[int, dict[str, int]] = {}

            # ROUND-SNAPSHOT PROBE CONTRACT: membership is tested against
            # (a) the generation bitmaps frozen at round start, (b) the
            # set of urls fetched earlier in this round (markVisited,
            # dfs_basic.go:48), and (c) urls admitted by EARLIER pages of
            # this round (their add_many, dfs_basic.go:121-123). When no
            # rotation occurs inside the round this is op-for-op identical
            # to probing the live bloom sequentially — (b) and (c) ARE
            # exactly this round's live inserts. Across a mid-round
            # rotation it is the defined engine semantics (one probe
            # snapshot per round), since a distributed round broadcasts
            # its seen-set once; inserts still apply per-op to the live
            # rolling filter, so rotation and the lost-insert quirk land
            # on the same op as the reference's.
            if self.seen_filter == "cuckoo":
                # no copy needed: cuckoo-mode inserts are DEFERRED to the
                # round-end canonical commit, so the live filter IS the
                # round-start snapshot for the whole page loop
                snap_probe = self.cuckoo.contains
            else:
                snap = [b.copy() for b in self.bloom.blooms]
                snap_probe = \
                    lambda lc: any(b.contains(lc) for b in snap)  # noqa: E731
            round_inserts: list[str] = []
            fetched_this_round: set[str] = set()
            admitted_this_round: set[str] = set()
            news_rules = self.robots.rules_for_round(rnd) \
                if self.mode == "news" else None

            for pos, e in enumerate(batch):
                host = host_of(e.url)
                part = partition_of(host, self.n_partitions)
                c = counters.setdefault(part, {"fetched": 0, "deduped": 0,
                                               "enqueued": 0, "stashed": 0})
                c["fetched"] += 1
                page = self.pages.get(e.url)
                success = page is not None
                res.crawl_order.append({
                    "seq": self.fetch_seq, "url_canon": e.url, "depth": e.depth,
                    "round": rnd, "host": host, "success": success,
                })
                self.fetch_seq += 1
                if e.url in self.poison_urls:
                    # DLQ: the message dies before the accumulator — no
                    # markVisited, no document, no links
                    res.quarantine.append({"url_canon": e.url, "round": rnd})
                    continue
                if self.mode == "news":
                    self._news_page(e, success, rnd, snap_probe,
                                    admitted_this_round, news_rules, c, res,
                                    round_inserts)
                    continue
                # markVisited happens before link handling (dfs_basic.go:48);
                # bloom errors are logged-and-ignored in the reference
                # (dfs_basic.go:61-65); rotation/lost-insert semantics are
                # inside the rolling filter itself
                fetched_this_round.add(e.url)
                if self.seen_filter == "bloom":
                    self.bloom.add(e.url)
                else:
                    round_inserts.append(e.url)
                if not success:
                    continue
                res.documents.append({"url_canon": e.url, "depth": e.depth,
                                      "round": rnd, "host": host})
                source = sld_tld(host)
                to_visit: list[str] = []
                for link in extract_outlinks(e.url, page.caption.encode()):
                    lc = canonicalize(link)
                    if lc is None:
                        continue
                    lhost = host_of(lc)
                    target = sld_tld(lhost)
                    if source == target and e.depth < self.max_depth:
                        # bloom is only updated AFTER the whole page (SetMany,
                        # dfs_basic.go:121-123): two raw-distinct hrefs that
                        # resolve to the same URL are BOTH enqueued — quirk kept
                        seen = (lc in fetched_this_round
                                or lc in admitted_this_round
                                or snap_probe(lc))
                        if not seen:
                            self._enqueue(lc, e.depth + 1, e.url, rnd)
                            to_visit.append(lc)
                            c["enqueued"] += 1
                        else:
                            c["deduped"] += 1
                    elif source != target:
                        self.url_store.setdefault(target, {})[lc] = e.url
                        c["stashed"] += 1
                if to_visit:
                    # reference logs and continues (dfs_basic.go:121-123)
                    if self.seen_filter == "bloom":
                        self.bloom.add_many(to_visit)
                    else:
                        round_inserts.extend(to_visit)
                    admitted_this_round.update(to_visit)

            for part, c in sorted(counters.items()):
                res.lineage.append({"round": rnd, "partition": part, **c})
            if self.seen_filter == "cuckoo":
                # round-END commit in canonical per-shard order — the
                # defined cuckoo-mode semantics (see __init__)
                self.cuckoo.add_many_canonical(round_inserts)
            rnd += 1

        self._rnd = rnd
        res.bloom = self.bloom
        res.cuckoo = self.cuckoo
        res.rounds = rnd
        return res

    def readmit(self, urls) -> int:
        """Recrawl API (cuckoo mode only — the per-URL forget the rolling
        bloom cannot express): delete each url from the seen-set and
        re-enqueue it at depth 0 with origin 'readmit', so the next
        :meth:`run` call refetches it. Returns the number re-enqueued."""
        assert self.seen_filter == "cuckoo", \
            "readmit requires the cuckoo seen-set"
        self._seed_once()  # seeds keep the first seqs (engine parity)
        n = 0
        for u in urls:
            c = canonicalize(u)
            if c is None:
                continue
            self.cuckoo.delete(c)
            self._enqueue(c, 0, "readmit", self._rnd)
            n += 1
        return n


def load_corpus(corpus_dir: str):
    """Load a generated corpus into oracle inputs."""
    import json
    import os

    import pyarrow.parquet as pq

    pages_t = pq.read_table(os.path.join(corpus_dir, "pages.parquet"),
                            columns=["url_canon", "url", "caption", "host"])
    pages = {
        r["url_canon"]: Page(url=r["url"], caption=r["caption"], host=r["host"])
        for r in pages_t.to_pylist()
    }
    robots_t = pq.read_table(os.path.join(corpus_dir, "robots.parquet"))
    robots = [(r["host"], r["body"], r.get("from_round", 0))
              for r in robots_t.to_pylist()]
    seeds_t = pq.read_table(os.path.join(corpus_dir, "seeds.parquet"))
    seeds = [(r["url"], r["priority"]) for r in seeds_t.to_pylist()]
    with open(os.path.join(corpus_dir, "params.json")) as f:
        params = json.load(f)
    return pages, robots, seeds, params


def run_oracle(corpus_dir: str, n_partitions: int = 8,
               poison_urls: set[str] | None = None,
               mode: str = "dfs", seen_filter: str = "bloom",
               host_budgets: dict | None = None) -> CrawlResult:
    pages, robots, seeds, params = load_corpus(corpus_dir)
    oc = OracleCrawler(
        pages, robots, seeds,
        max_depth=params["max_depth"],
        per_host_budget=params["per_host_budget"],
        global_budget=params["global_budget"],
        max_rounds=params["max_rounds"],
        bloom_max_n=params["bloom_max_n"],
        bloom_p=params["bloom_p"],
        n_partitions=n_partitions,
        bloom_count=params.get("bloom_count", 1),
        robots_ttl_rounds=params.get("robots_ttl_rounds"),
        poison_urls=poison_urls,
        mode=mode,
        seen_filter=seen_filter,
        cuckoo_shards=params.get("cuckoo_shards", 4),
        cuckoo_capacity=params.get("cuckoo_capacity"),
        host_budgets=host_budgets,
    )
    return oc.run()
