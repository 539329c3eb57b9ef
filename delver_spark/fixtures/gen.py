"""Deterministic synthetic crawl corpus generator (FIXTURES.md §A).

Produces, under ``out_dir``:
  pages.parquet   — (url, url_canon, image_id, bytes, w, h, fmt, caption,
                     phash, pix_md5)  # exact BASELINE.json input_hint shape
                     plus the join key + integrity columns
  seeds.parquet   — (url, priority)
  robots.parquet  — (host, body)
  edges.parquet   — (src_url, dst_url, pos)  # ground-truth link graph
  golden_pixels.parquet — (url_canon, pixels) original pre-encode pixels
                     (only when n_pages <= golden_pixel_cap)
  params.json     — corpus + crawl parameters

Everything derives from (seed, n_pages, n_hosts); no wall-clock, no network.
Host sizes follow a Zipf(1.2) law → deliberate hot-host skew (SURVEY §4.2.1).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..engine.urlnorm import canonicalize
from .codecs import encode, decode, phash64, pixel_md5

# language-tagged filler vocabularies (deterministic language signal, X5)
_LANG_WORDS = {
    "en": ["the quick brown fox jumps over a lazy dog and it is what it is",
           "we are happy to share the good news of the day"],
    "es": ["el rápido zorro marrón salta sobre el perro y se dice que es como una fiesta en español",
           "la casa de la ciudad es grande y el cielo se ve azul por la mañana"],
    "fr": ["le renard brun saute par-dessus le chien et vous aimez faire cela pendant votre temps libre",
           "la maison est grande et le ciel est bleu ce matin qu'est-ce que vous en pensez"],
    "de": ["der schnelle braune fuchs springt über den faulen hund und das ist ein gutes zeichen",
           "die stadt ist groß und der himmel ist blau und ich bin mit sie zufrieden"],
}
_COUNTRY_MENTIONS = ["Germany", "Kenya", "Monaco", "United States", "France", "Japan"]
_COMPANY_MENTIONS = ["battalion oil", "maximus", "apple", "nxp semiconductors nv"]


def _zipf_probs(h: int, s: float = 1.2) -> np.ndarray:
    p = 1.0 / np.arange(1, h + 1) ** s
    return p / p.sum()


def generate_corpus(
    out_dir: str,
    n_pages: int = 1000,
    n_hosts: int = 50,
    seed: int = 42,
    n_seeds: int = 10,
    max_depth: int = 3,
    per_host_budget: int = 4,
    global_budget: int = 64,
    max_rounds: int = 200,
    golden_pixel_cap: int = 5000,
    sizes: tuple = (16, 24, 32),
    bloom_max_n: int | None = None,
    bloom_count: int = 1,
    path_style: str = "default",
) -> dict:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    domains = [f"d{k:03d}.test" for k in range(n_hosts)]
    dom_of_page = rng.choice(n_hosts, size=n_pages, p=_zipf_probs(n_hosts))
    # deterministic per-domain language
    langs = list(_LANG_WORDS)
    lang_of_dom = [langs[k % len(langs)] for k in range(n_hosts)]

    # host variant per page: base (75%), www. (15%), old. (10%)
    variant_roll = rng.random(n_pages)
    # ~8% of pages live under /bad (robots-disallowed on some domains)
    bad_roll = rng.random(n_pages) < 0.08
    size_choices = np.array(sizes, dtype=np.int32)
    ws = rng.choice(size_choices, n_pages)
    hs = rng.choice(size_choices, n_pages)
    fmts = np.where(rng.random(n_pages) < 0.6, "ppm", "qjpg")

    pages_of_dom: dict[int, list[int]] = {}
    hosts, paths, urls = [], [], []
    for i in range(n_pages):
        d = int(dom_of_page[i])
        pages_of_dom.setdefault(d, []).append(i)
        base = domains[d]
        v = variant_roll[i]
        host = base if v < 0.75 else ("www." + base if v < 0.90 else "old." + base)
        if path_style == "news":
            # deterministic mix exercising every news.go admission gate
            # (functions/news.py): article first-token bypass, long-slug
            # admit, path/extension blacklists, ':'+'=' gate, short-token
            # reject, and robots (/bad) interplay on an admissible shape
            slug = f"story-{i:06d}-{'x' * 18}"  # one token > 20 chars
            if bad_roll[i]:
                path = f"/bad/{slug}"  # admissible but robots-disallowed
            else:
                path = [f"/article/{i:06d}",
                        f"/news/{slug}",
                        f"/tag/{i:06d}",
                        f"/media/pic-{i:06d}.jpg",
                        f"/article/{i:06d}:a=b",
                        f"/p/{i:06d}"][i % 6]
        else:
            path = (f"/bad/{i:06d}" if bad_roll[i] else f"/p/{i:06d}")
        hosts.append(host)
        paths.append(path)
        urls.append(f"http://{host}{path}")

    url_canons = [canonicalize(u) for u in urls]

    # --- link graph + captions -------------------------------------------
    edges_src, edges_dst, edges_pos = [], [], []
    captions = []
    img_bytes, phashes, pix_md5s, golden_px = [], [], [], []
    for i in range(n_pages):
        d = int(dom_of_page[i])
        lang = lang_of_dom[d]
        outdeg = int(rng.integers(0, 13))
        links: list[tuple[str, str, bool]] = []  # (href, resolved, render_as_a)
        same_pool = pages_of_dom[d]
        for _ in range(outdeg):
            roll = rng.random()
            if roll < 0.05 and links:
                # duplicate of an earlier link in the same caption
                links.append(links[int(rng.integers(0, len(links)))])
                continue
            as_a = bool(rng.random() < 0.6)
            if roll < 0.75:
                # same-domain target
                t = int(same_pool[int(rng.integers(0, len(same_pool)))])
                style = rng.random()
                # relative forms only resolve to urls[t] when the host
                # variant matches the source page's host
                if not as_a or hosts[t] != hosts[i]:
                    href = urls[t]  # bare links must be absolute (FSM rule b)
                elif style < 0.4:
                    href = paths[t]  # absolute-path relative
                elif style < 0.6:
                    href = ".." + paths[t]  # dot-segment relative
                else:
                    href = urls[t]
            else:
                # cross-domain target
                t = int(rng.integers(0, n_pages))
                href = urls[t]
            links.append((href, urls[t], as_a))

        words = _LANG_WORDS[lang][int(rng.integers(0, 2))].split()
        parts = [f"<title>{lang} page {i:06d}</title> "]
        resolved = [r for _, r, _ in links]
        wpos = 0
        for href, _, as_a in links:
            chunk = " ".join(words[wpos % len(words):(wpos % len(words)) + 4])
            wpos += 3
            if as_a:
                parts.append(f'{chunk} <a href="{href}">go</a> ')
            else:
                parts.append(f"{chunk} {href} ")
        if rng.random() < 0.15:
            parts.append(_COUNTRY_MENTIONS[int(rng.integers(0, len(_COUNTRY_MENTIONS)))] + " ")
        if rng.random() < 0.10:
            parts.append(_COMPANY_MENTIONS[int(rng.integers(0, len(_COMPANY_MENTIONS)))] + " ")
        parts.append(" ".join(words[:6]) + ".")
        captions.append("".join(parts))
        for pos, r in enumerate(resolved):
            edges_src.append(urls[i])
            edges_dst.append(r)
            edges_pos.append(pos)

        pix = rng.integers(0, 256, size=(int(hs[i]), int(ws[i]), 3), dtype=np.uint8)
        blob = encode(pix, str(fmts[i]))
        img_bytes.append(blob)
        phashes.append(phash64(decode(blob, str(fmts[i]))))
        pix_md5s.append(pixel_md5(pix))
        if n_pages <= golden_pixel_cap:
            golden_px.append(pix.tobytes())

    pages = pa.table({
        "image_id": pa.array([f"img-{i:08d}" for i in range(n_pages)]),
        "bytes": pa.array(img_bytes, type=pa.binary()),
        "w": pa.array(ws, type=pa.int32()),
        "h": pa.array(hs, type=pa.int32()),
        "fmt": pa.array([str(f) for f in fmts]),
        "caption": pa.array(captions),
        "phash": pa.array(phashes, type=pa.int64()),
        "url": pa.array(urls),
        "url_canon": pa.array(url_canons),
        "host": pa.array(hosts),
        "pix_md5": pa.array(pix_md5s),
    })
    # shard + small row groups so the payload scan parallelizes (a single
    # pyarrow file defaults to ONE row group → an unsplittable Spark scan)
    pages_dir = os.path.join(out_dir, "pages.parquet")
    os.makedirs(pages_dir, exist_ok=True)
    shard_rows = 6250
    n_shards = max(1, (n_pages + shard_rows - 1) // shard_rows)
    for s in range(n_shards):
        pq.write_table(pages.slice(s * shard_rows, shard_rows),
                       os.path.join(pages_dir, f"part-{s:05d}.parquet"),
                       row_group_size=2048)

    # --- seeds: first page of each of the first n_seeds domains ------------
    seed_urls = []
    for k in range(min(n_seeds, n_hosts)):
        pool = pages_of_dom.get(k)
        if pool:
            seed_urls.append(urls[pool[0]])
    pq.write_table(
        pa.table({"url": pa.array(seed_urls),
                  "priority": pa.array([0] * len(seed_urls), type=pa.int32())}),
        os.path.join(out_dir, "seeds.parquet"))

    # --- robots: 10% disallow /bad, 5% malformed, rest allow-all -----------
    rb_hosts, rb_bodies = [], []
    for k, dom in enumerate(domains):
        roll = k % 20
        if roll < 2:  # 10%
            body = "User-agent: *\nDisallow: /bad\n"
        elif roll == 2:  # 5%
            body = "%%% this is not a valid robots file &&&"
        else:
            body = "User-agent: *\nDisallow:\n"
        for host in (dom, "www." + dom, "old." + dom):
            rb_hosts.append(host)
            rb_bodies.append(body)
    pq.write_table(pa.table({"host": pa.array(rb_hosts), "body": pa.array(rb_bodies)}),
                   os.path.join(out_dir, "robots.parquet"))

    pq.write_table(pa.table({"src_url": pa.array(edges_src),
                             "dst_url": pa.array(edges_dst),
                             "pos": pa.array(edges_pos, type=pa.int32())}),
                   os.path.join(out_dir, "edges.parquet"))

    if golden_px:
        pq.write_table(pa.table({"url_canon": pa.array(url_canons),
                                 "pixels": pa.array(golden_px, type=pa.binary())}),
                       os.path.join(out_dir, "golden_pixels.parquet"))

    params = {
        "seed": seed, "n_pages": n_pages, "n_hosts": n_hosts,
        "n_seeds": n_seeds, "max_depth": max_depth,
        "per_host_budget": per_host_budget, "global_budget": global_budget,
        "max_rounds": max_rounds,
        "bloom_max_n": bloom_max_n if bloom_max_n is not None else 4 * n_pages,
        "bloom_p": 0.01,
        "bloom_count": bloom_count,
    }
    with open(os.path.join(out_dir, "params.json"), "w") as f:
        json.dump(params, f, indent=2)
    return params


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "corpus/default"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    r = int(sys.argv[4]) if len(sys.argv) > 4 else 200
    style = sys.argv[5] if len(sys.argv) > 5 else "default"
    print(json.dumps(generate_corpus(out, n_pages=n, n_hosts=h,
                                     max_rounds=r, path_style=style)))
