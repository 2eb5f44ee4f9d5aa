#!/usr/bin/env python3
"""Oracle-INDEPENDENCE audit: recompute the statistically trickiest
queries (27) from the RAW fixture parquet in pure Python (textbook
formulas, stdlib math — no Spark, no DuckDB SQL) and diff against the
engine's Verify dump.

Why this exists: the driver's correctness gate proves engine ≡ DuckDB
oracle, but BOTH sides are builder-written — a mirrored misreading
(the same wrong formula transcribed into Scala and into SQL) is
invisible to that check. This tool is the third computation: each
statistic below is implemented from its textbook definition (Kaplan–
Meier product-limit, Theil-T decomposition, power-iteration stationary
distribution, Jensen–Shannon divergence, MASE, classical seasonal
decomposition, Gini rank formula, Herfindahl, PSI, mutual information,
chi-square residuals, one-way ANOVA, Lorenz shares, two-sample KS,
Spearman with average ranks, Neyman allocation, Brown double
smoothing, Benford, lag autocorrelation, NDCG, exact cosine top-k),
reading the raw tables with parquet readers only (pandas/pyarrow as
I/O, never as a query engine).

Tolerances: outputs rounded to `dp` decimals compare within
0.6·10^-dp — wide enough for partial-aggregation-order double drift
(~1e-12 relative), orders of magnitude tighter than any formula-level
error. Integer outputs compare exactly (except the two ANOVA sums of
squares, which round a ~1e12 double to a whole unit: ±1).

Usage: independent_check.py <sfDir> <verifyOutDir> [out.json]
  (dev/driver-side tooling, like tools/check.py — the library itself
   never touches this script)
"""
import glob
import json
import math
import sys
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
REPORT = sys.argv[3] if len(sys.argv) > 3 else None


def table(name):
    return pd.read_parquet(f"{SF}/{name}.parquet")


def dump(name):
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not files:
        raise FileNotFoundError(f"no dump for {name} under {OUT}")
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def rnd(x, dp):
    """Spark round() parity: BigDecimal.valueOf(double) HALF_UP — the
    shortest-repr decimal expansion, which Python's repr() matches."""
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return None
    q = Decimal(1).scaleb(-dp) if dp > 0 else Decimal(1)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def cents(price):
    """CAST(round(p * 100, 0) AS BIGINT) parity."""
    return int(Decimal(repr(float(price) * 100)).quantize(
        Decimal(1), rounding=ROUND_HALF_UP))


def weekday(d):
    """pmod(datediff(day, 1970-01-01) + 4, 7) — 0 = Sunday convention
    used by the engine (epoch Thursday + 4)."""
    return (d.toordinal() - 719163 + 4) % 7


def pearson_from_sums(n, sx, sy, sxy, sxx, syy):
    num = n * sxy - sx * sy
    den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return num / den


results = {}


def check(name, expected, keys, spec):
    """expected: list of dicts; spec: {col: ('exact'|'tol', abs_tol)}.
    Engine dump and expectation are sorted by `keys` and compared
    cell-by-cell."""
    try:
        got = dump(name)
    except FileNotFoundError as e:
        results[name] = {"status": "NO_DUMP", "detail": str(e)}
        print(f"SKIP {name}: {e}")
        return
    exp = pd.DataFrame(expected)
    issues = []
    if set(got.columns) != set(exp.columns):
        issues.append(f"cols {sorted(got.columns)} vs {sorted(exp.columns)}")
    elif len(got) != len(exp):
        issues.append(f"rows {len(got)} vs {len(exp)}")
    else:
        g = got.sort_values(keys).reset_index(drop=True)
        e = exp.sort_values(keys).reset_index(drop=True)
        max_dev = 0.0
        for c in e.columns:
            mode, tol = spec.get(c, ("exact", 0))
            for i in range(len(e)):
                gv, ev = g[c][i], e[c][i]
                gnan = gv is None or (isinstance(gv, float) and math.isnan(gv))
                enan = ev is None or (isinstance(ev, float) and math.isnan(ev))
                if gnan or enan:
                    if gnan != enan:
                        issues.append(f"{c}[{i}]: {gv!r} vs {ev!r} (null)")
                    continue
                if mode == "exact":
                    if gv != ev:
                        issues.append(f"{c}[{i}]: {gv!r} vs {ev!r}")
                else:
                    d = abs(float(gv) - float(ev))
                    max_dev = max(max_dev, d)
                    if d > tol:
                        issues.append(
                            f"{c}[{i}]: {gv!r} vs {ev!r} (|Δ|={d:.2e})")
                if len(issues) > 8:
                    break
            if len(issues) > 8:
                break
        results[name] = {"status": "FAIL" if issues else "OK",
                         "rows": len(e), "max_float_dev": max_dev}
    if issues:
        results[name] = {"status": "FAIL", "detail": issues[:8]}
        print(f"FAIL {name}: " + " | ".join(issues[:4]))
    else:
        print(f"ok   {name} ({len(exp)} rows, independent recompute agrees)")


# ---------------------------------------------------------------- fixtures
orders = table("orders")
orders_rows = list(zip(orders.o_orderkey, orders.o_custkey,
                       orders.o_totalprice,
                       pd.to_datetime(orders.o_orderdate).dt.date,
                       orders.o_orderpriority, orders.o_orderstatus))


# ------------------------------------------------------------ q168 PSI
def q168():
    ev = table("events")
    n_a = defaultdict(int)
    n_b = defaultdict(int)
    ta = tb = 0
    for uid, v in zip(ev.user_id, ev.value):
        b = int(min(max(math.floor(v / 10.0), 0.0), 9.0))
        if uid % 2 == 0:
            n_a[b] += 1
            ta += 1
        else:
            n_b[b] += 1
            tb += 1
    rows = []
    for b in sorted(set(n_a) | set(n_b)):
        p = (n_a[b] + 1) / (ta + 10)
        q = (n_b[b] + 1) / (tb + 10)
        rows.append({"bin": b, "n_a": n_a[b], "n_b": n_b[b],
                     "psi_term": rnd((p - q) * math.log(p / q), 6)})
    check("q168_psi_drift", rows, ["bin"],
          {"psi_term": ("tol", 6e-7)})


# ------------------------------------------------------------ q185 HHI
def q185():
    li = table("lineitem")
    ps = defaultdict(int)
    for pk, sk in zip(li.l_partkey, li.l_suppkey):
        ps[(pk, sk)] += 1
    per_part = defaultdict(lambda: [0, 0, []])   # sum n², sum n, supp set
    supp = defaultdict(set)
    sq = defaultdict(int)
    tot = defaultdict(int)
    for (pk, sk), n in ps.items():
        sq[pk] += n * n
        tot[pk] += n
        supp[pk].add(sk)
    part = table("part")
    brand_of = dict(zip(part.p_partkey, part.p_brand))
    agg = defaultdict(lambda: [0, 0.0, 0.0])     # n_parts, Σhhi, Σnsupp
    for pk in sq:
        b = brand_of[pk]
        agg[b][0] += 1
        agg[b][1] += sq[pk] / (tot[pk] * tot[pk])
        agg[b][2] += len(supp[pk])
    rows = [{"p_brand": b, "n_parts": a[0],
             "avg_hhi": rnd(a[1] / a[0], 4),
             "avg_suppliers": rnd(a[2] / a[0], 4)}
            for b, a in agg.items()]
    check("q185_supplier_hhi", rows, ["p_brand"],
          {"avg_hhi": ("tol", 6e-5), "avg_suppliers": ("tol", 6e-5)})


# ------------------------------------------------------------ q208 Benford
def q208():
    cnt = defaultdict(int)
    for (_, _, p, _, _, _) in orders_rows:
        cnt[int(str(cents(p))[0])] += 1
    total = sum(cnt.values())
    rows = [{"digit": d, "n": n,
             "observed_pct": rnd(n / total, 6),
             "benford_pct": rnd(math.log10(1 + 1 / d), 6)}
            for d, n in cnt.items()]
    check("q208_benford", rows, ["digit"],
          {"observed_pct": ("tol", 6e-7), "benford_pct": ("tol", 6e-7)})


def daily_cents():
    d = defaultdict(int)
    for (_, _, p, day, _, _) in orders_rows:
        d[day] += cents(p)
    return d


# ------------------------------------------------------------ q209 autocorr
def q209():
    daily = {d: c // 100 for d, c in daily_cents().items()}
    rows = []
    for k in (1, 7):
        xs = [(daily[d], daily[d - pd.Timedelta(days=k)])
              for d in daily if d - pd.Timedelta(days=k) in daily]
        n = len(xs)
        sx = sum(x for x, _ in xs)
        sy = sum(y for _, y in xs)
        sxy = sum(x * y for x, y in xs)
        sxx = sum(x * x for x, _ in xs)
        syy = sum(y * y for _, y in xs)
        rows.append({"lag": k, "n": n,
                     "autocorr": rnd(pearson_from_sums(
                         n, sx, sy, sxy, sxx, syy), 6)})
    check("q209_autocorr", rows, ["lag"], {"autocorr": ("tol", 6e-7)})


def contingency():
    cust_seg = dict(zip(table("customer").c_custkey,
                        table("customer").c_mktsegment))
    cells = defaultdict(int)
    for (_, ck, _, _, prio, _) in orders_rows:
        cells[(cust_seg[ck], prio)] += 1
    nx = defaultdict(int)
    ny = defaultdict(int)
    for (s, p), n in cells.items():
        nx[s] += n
        ny[p] += n
    return cells, nx, ny, sum(cells.values())


# ------------------------------------------------------------ q210 MI
def q210():
    cells, nx, ny, nn = contingency()
    mi = defaultdict(float)
    cnt = defaultdict(int)
    for (s, p), n in cells.items():
        mi[s] += (n / nn) * math.log((n * nn) / (nx[s] * ny[p]))
        cnt[s] += n
    rows = [{"seg": s, "n_orders": cnt[s], "mi_contrib": rnd(mi[s], 6)}
            for s in mi]
    check("q210_mutual_info", rows, ["seg"], {"mi_contrib": ("tol", 6e-7)})


# ------------------------------------------------------------ q211 KM
def q211():
    per_cust = defaultdict(list)
    for (_, ck, _, day, _, _) in orders_rows:
        per_cust[ck].append(day)
    d_t = defaultdict(int)
    for days in per_cust.values():
        days.sort()
        for a, b in zip(days, days[1:]):
            d_t[(b - a).days] += 1
    n_total = sum(d_t.values())
    rows = []
    at_risk = n_total
    surv_log = 0.0
    for t in sorted(d_t):
        d = d_t[t]
        if d >= at_risk:
            s = 0.0
        else:
            surv_log += math.log(1.0 - d / at_risk)
            s = rnd(math.exp(surv_log), 6)
        rows.append({"t_days": t, "n_risk": at_risk, "n_events": d,
                     "survival": s})
        at_risk -= d
    check("q211_reorder_survival", rows, ["t_days"],
          {"survival": ("tol", 6e-7)})


# ------------------------------------------------------------ q213 chi²
def q213():
    cells, nx, ny, nn = contingency()
    rows = []
    for (s, p), n in cells.items():
        exp = nx[s] * ny[p] / nn
        rows.append({"seg": s, "prio": p, "observed": n,
                     "expected": rnd(exp, 6),
                     "chi2_contrib": rnd((n - exp) ** 2 / exp, 6)})
    check("q213_chisq_cells", rows, ["seg", "prio"],
          {"expected": ("tol", 6e-7), "chi2_contrib": ("tol", 6e-6)})


# ------------------------------------------------------------ q216 ANOVA
def q216():
    docs = table("documents")
    per_lang = defaultdict(lambda: [0, 0, 0])
    for lang, nc in zip(docs.lang, docs.n_chars):
        a = per_lang[lang]
        a[0] += 1
        a[1] += int(nc)
        a[2] += int(nc) * int(nc)
    n = sum(a[0] for a in per_lang.values())
    s = sum(a[1] for a in per_lang.values())
    ss = sum(a[2] for a in per_lang.values())
    grp = sum(a[1] * a[1] / a[0] for a in per_lang.values())
    ss_total = ss - s * s / n
    ss_between = grp - s * s / n
    rows = [{"n_docs": n, "n_langs": len(per_lang),
             "ss_total": int(rnd(ss_total, 0)),
             "ss_between": int(rnd(ss_between, 0)),
             "eta2": rnd(ss_between / ss_total, 6)}]
    check("q216_length_anova", rows, ["n_docs"],
          {"ss_total": ("tol", 1.01), "ss_between": ("tol", 1.01),
           "eta2": ("tol", 6e-7)})


# ------------------------------------------------------------ q243 Lorenz
def q243():
    per_cust = defaultdict(int)
    for (_, ck, p, _, _, _) in orders_rows:
        per_cust[ck] += cents(p)
    ranked = sorted(per_cust.items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(ranked)
    dec = defaultdict(lambda: [0, 0])
    for i, (_, c) in enumerate(ranked):
        d = i * 10 // n
        dec[d][0] += 1
        dec[d][1] += c
    tot = sum(c for _, c in dec.values())
    rows, cum = [], 0
    for d in sorted(dec):
        cum += dec[d][1]
        rows.append({"decile": d, "n_customers": dec[d][0],
                     "share": rnd(dec[d][1] / tot, 6),
                     "cum_share": rnd(cum / tot, 6)})
    check("q243_revenue_lorenz", rows, ["decile"],
          {"share": ("tol", 6e-7), "cum_share": ("tol", 6e-7)})


# ------------------------------------------------------------ q270 KS
def q270():
    ev = table("events")
    cnt = defaultdict(int)
    for t, v in zip(ev.event_type, ev.value):
        cnt[(int(math.floor(v * 10)), t)] += 1
    types = sorted({t for _, t in cnt})
    bins = sorted({b for b, _ in cnt})
    n_t = {t: sum(n for (b, tt), n in cnt.items() if tt == t)
           for t in types}
    n_all = sum(n_t.values())
    rows = []
    for t in types:
        cum_t = cum_all = 0
        ks = 0.0
        for b in bins:
            cum_t += cnt.get((b, t), 0)
            cum_all += sum(cnt.get((b, tt), 0) for tt in types)
            if n_all > n_t[t]:
                gap = abs(cum_t / n_t[t] -
                          (cum_all - cum_t) / (n_all - n_t[t]))
                ks = max(ks, gap)
        rows.append({"event_type": t, "n_events": n_t[t],
                     "ks_stat": rnd(ks, 6)})
    check("q270_ks_drift", rows, ["event_type"], {"ks_stat": ("tol", 6e-7)})


# ------------------------------------------------------------ q274 Spearman
def q274():
    part = table("part")
    by_type = defaultdict(list)
    for t, sz, pr in zip(part.p_type, part.p_size, part.p_retailprice):
        by_type[t].append((int(sz), float(pr)))
    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        r = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            # rank() + (ties-1)/2 == min-rank + (ties-1)/2
            for k in range(i, j):
                r[order[k]] = (i + 1) + (j - i - 1) / 2.0
            i = j
        return r
    rows = []
    for t, xs in by_type.items():
        rx = avg_ranks([x for x, _ in xs])
        ry = avg_ranks([y for _, y in xs])
        n = float(len(xs))
        sx, sy = sum(rx), sum(ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        sxx = sum(a * a for a in rx)
        syy = sum(b * b for b in ry)
        if n * sxx - sx * sx <= 0 or n * syy - sy * sy <= 0:
            continue
        rows.append({"p_type": t, "n_parts": len(xs),
                     "spearman": rnd(pearson_from_sums(
                         n, sx, sy, sxy, sxx, syy), 6)})
    check("q274_spearman", rows, ["p_type"], {"spearman": ("tol", 6e-6)})


# ------------------------------------------------------------ q275 Theil
def q275():
    per_cust = defaultdict(int)
    for (_, ck, p, _, _, _) in orders_rows:
        per_cust[ck] += cents(p)
    cust = table("customer")
    nat = dict(zip(table("nation").n_nationkey, table("nation").n_name))
    nation_of = {ck: nat[nk] for ck, nk in
                 zip(cust.c_custkey, cust.c_nationkey)}
    groups = defaultdict(list)
    for ck, c in per_cust.items():
        if c > 0:
            groups[nation_of[ck]].append(c)
    n_all = sum(len(v) for v in groups.values())
    s_all = sum(sum(v) for v in groups.values())
    mu = s_all / n_all
    rows = []
    for g, xs in groups.items():
        mu_g = sum(xs) / len(xs)
        t_g = sum((x / mu_g) * math.log(x / mu_g) for x in xs) / len(xs)
        share = sum(xs) / s_all
        rows.append({"n_name": g, "n_customers": len(xs),
                     "revenue_share": rnd(share, 6),
                     "theil_within": rnd(t_g, 6),
                     "between_term": rnd(share * math.log(mu_g / mu), 6)})
    check("q275_theil", rows, ["n_name"],
          {"revenue_share": ("tol", 6e-7), "theil_within": ("tol", 6e-6),
           "between_term": ("tol", 6e-7)})


# ------------------------------------------------------------ q283 Markov
def q283():
    ev = table("events")
    per_user = defaultdict(list)
    for eid, ts, uid, t in zip(ev.event_id, ev.ts, ev.user_id,
                               ev.event_type):
        per_user[uid].append((ts, eid, t))
    trans = defaultdict(int)
    for seq in per_user.values():
        seq.sort(key=lambda x: (x[0], x[1]))
        for (a, b) in zip(seq, seq[1:]):
            trans[(a[2], b[2])] += 1
    tot = defaultdict(int)
    for (c, _), n in trans.items():
        tot[c] += n
    p = {(c, x): n / tot[c] for (c, x), n in trans.items()}
    states = sorted(tot)
    r = {s: 1.0 / len(states) for s in states}
    for _ in range(12):
        nr = defaultdict(float)
        for (c, x), pv in p.items():
            if c in r:
                nr[x] += r[c] * pv
        r = dict(nr)
    rows = [{"event_type": s, "stationary_prob": rnd(v, 6)}
            for s, v in r.items()]
    check("q283_markov_stationary", rows, ["event_type"],
          {"stationary_prob": ("tol", 2e-5)})


# ------------------------------------------------------------ q287 Gini
def q287():
    li = table("lineitem")
    part = table("part")
    brand_of = dict(zip(part.p_partkey, part.p_brand))
    pp = defaultdict(int)
    for pk, ep in zip(li.l_partkey, li.l_extendedprice):
        pp[pk] += cents(ep)
    by_brand = defaultdict(list)
    for pk, c in pp.items():
        by_brand[brand_of[pk]].append((c, pk))
    rows = []
    for b, xs in by_brand.items():
        xs.sort()
        n = len(xs)
        sx = sum(c for c, _ in xs)
        six = sum((i + 1) * c for i, (c, _) in enumerate(xs))
        rows.append({"p_brand": b, "n_parts": n,
                     "gini": rnd((2.0 * six - (n + 1) * sx) / (n * sx), 6)})
    check("q287_brand_gini", rows, ["p_brand"], {"gini": ("tol", 6e-7)})


# ------------------------------------------------------------ q288 Neyman
def q288():
    strata = defaultdict(lambda: [0, 0, 0.0])
    for (_, _, p, _, prio, _) in orders_rows:
        c = cents(p)
        a = strata[prio]
        a[0] += 1
        a[1] += c
        a[2] += float(c) * float(c)
    stats = {}
    for prio, (n, sx, sxx) in strata.items():
        sigma = math.sqrt(sxx / n - (sx / n) * (sx / n))
        stats[prio] = (n, sigma, n * sigma)
    d = sum(v[2] for v in stats.values())
    rows = [{"o_orderpriority": prio, "n_h": n,
             "sigma_usd": rnd(sigma / 100.0, 2),
             "neyman_share": rnd(ns / d, 6),
             "alloc_rows": int(rnd(1000 * (ns / d), 0))}
            for prio, (n, sigma, ns) in stats.items()]
    check("q288_neyman_allocation", rows, ["o_orderpriority"],
          {"sigma_usd": ("tol", 6e-3), "neyman_share": ("tol", 6e-7),
           "alloc_rows": ("tol", 1.01)})


# ------------------------------------------------------------ q300 Brown
def q300():
    dc = daily_cents()
    dollars = {d: c // 100 for d, c in dc.items()}
    w = [4 ** k * 5 ** (6 - k) for k in range(7)]

    def smooth(series, scale):
        out = {}
        for d in series:
            n = dsum = 0
            for k in range(7):
                src = d - pd.Timedelta(days=k)
                if src in series:
                    n += series[src] * w[k]
                    dsum += w[k]
            out[d] = int(Decimal(repr(n / dsum * scale)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP))
        return out
    s1c = smooth(dollars, 100)
    s2c = smooth(s1c, 1)
    rows = [{"day": pd.Timestamp(d), "dollars": dollars[d],
             "s1": s1c[d] / 100, "s2": s2c[d] / 100,
             "forecast_next": (s1c[d] * 9 - s2c[d] * 5) / 400}
            for d in dollars]
    check("q300_brown_forecast", rows, ["day"],
          {"s1": ("tol", 1e-9), "s2": ("tol", 1e-9),
           "forecast_next": ("tol", 1e-9)})


# ------------------------------------------------------------ q303 JSD
def q303():
    docs = table("documents")
    tf = defaultdict(lambda: defaultdict(int))
    for src, text in zip(docs.source, docs.text):
        for tok in text.split(" "):
            tf[src][tok] += 1
    totals = {s: sum(d.values()) for s, d in tf.items()}
    srcs = sorted(tf)
    rows = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            ta, tb = totals[a], totals[b]
            toks = set(tf[a]) | set(tf[b])
            common = sum(1 for t in toks if tf[a][t] and tf[b][t])
            jsd = 0.0
            for t in toks:
                pa = tf[a][t] / ta
                pb = tf[b][t] / tb
                m = (pa + pb) / 2
                if pa:
                    jsd += pa * math.log2(pa / m) / 2
                if pb:
                    jsd += pb * math.log2(pb / m) / 2
            rows.append({"src_a": a, "src_b": b,
                         "n_common_terms": common,
                         "jsd": rnd(jsd, 4) if common else 1.0})
    check("q303_source_jsd", rows, ["src_a", "src_b"],
          {"jsd": ("tol", 6e-5)})


def embeddings():
    e = table("embeddings")
    return [(int(v), [float(x) for x in emb], int(lb))
            for v, emb, lb in zip(e.vec_id, e.embedding, e.label)]


def cos(a, b):
    d = na = nb = 0.0
    for x, y in zip(a, b):
        d += x * y
        na += x * x
        nb += y * y
    return d / math.sqrt(na * nb)


# ------------------------------------------------------------ q306 PQ rerank
def q306():
    vecs = embeddings()
    q = next(e for v, e, _ in vecs if v == 1)
    scored = [(rnd(cos(e, q), 4), v, lb) for v, e, lb in vecs if v != 1]
    scored.sort(key=lambda t: (-t[0], t[1]))
    rows = [{"vec_id": v, "label": lb, "cos_sim": c}
            for c, v, lb in scored[:10]]
    check("q306_pq_rerank", rows, ["vec_id"], {"cos_sim": ("tol", 6e-5)})


# ------------------------------------------------------------ q308 MASE
def q308():
    dc = daily_cents()
    agg = defaultdict(lambda: [0, 0, 0])
    for d, c in dc.items():
        w7 = d - pd.Timedelta(days=7)
        d1 = d - pd.Timedelta(days=1)
        if w7 in dc and d1 in dc:
            a = agg[weekday(d)]
            a[0] += 1
            a[1] += abs(c - dc[w7])
            a[2] += abs(c - dc[d1])
    rows = [{"weekday": wd, "n_days": a[0],
             "abs_err_seasonal_cents": a[1], "abs_err_naive_cents": a[2],
             "mase": rnd(a[1] / a[2], 6) if a[2] > 0 else None}
            for wd, a in agg.items()]
    check("q308_seasonal_mase", rows, ["weekday"], {"mase": ("tol", 6e-7)})


# ------------------------------------------------------------ q311 NDCG
def q311():
    vecs = embeddings()
    idcg = sum((10 + 1 - i) / math.log2(i + 1) for i in range(1, 11))
    per_anchor = {}
    anchors = [(v, e) for v, e, _ in vecs if v < 128]
    for a_id, ea in anchors:
        pairs = []
        for b_id, eb, _ in vecs:
            if b_id == a_id:
                continue
            pairs.append((b_id, rnd(cos(ea, eb), 4),
                          rnd(cos(ea[:16], eb[:16]), 4)))
        by_full = sorted(pairs, key=lambda t: (-t[1], t[0]))
        full_rank = {b: i + 1 for i, (b, _, _) in enumerate(by_full)}
        by_trunc = sorted(pairs, key=lambda t: (-t[2], t[0]))
        dcg = 0.0
        for i, (b, _, _) in enumerate(by_trunc[:10]):
            rel = max(0, 11 - full_rank[b])
            dcg += rel / math.log2((i + 1) + 1.0)
        per_anchor[a_id] = int(Decimal(repr(dcg / idcg * 1e6)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP))
    bands = defaultdict(lambda: [0, 0])
    for v in per_anchor.values():
        b = bands[v // 100000]
        b[0] += 1
        b[1] += v
    rows = [{"band": b, "n_anchors": a[0],
             "mean_ndcg": rnd(a[1] / a[0] / 1e6, 6)}
            for b, a in bands.items()]
    check("q311_truncation_ndcg", rows, ["band"],
          {"mean_ndcg": ("tol", 6e-6)})


# ------------------------------------------------------------ q313 STL
def q313():
    dc = daily_cents()
    days = sorted(dc)
    det = {}
    for i in range(3, len(days) - 3):
        t7 = sum(dc[days[j]] for j in range(i - 3, i + 4))
        det[days[i]] = dc[days[i]] * 7 - t7
    per_wd = defaultdict(list)
    for d, v in det.items():
        per_wd[weekday(d)].append(v)
    rows = []
    for wd, vs in per_wd.items():
        seasonal_d = sum(vs) / 7 / len(vs) / 100
        mar = sum(abs(v / 700 - seasonal_d) for v in vs) / len(vs)
        rows.append({"weekday": wd, "n_days": len(vs),
                     "seasonal": rnd(seasonal_d, 6),
                     "mean_abs_residual": rnd(mar, 2)})
    check("q313_stl_weekday", rows, ["weekday"],
          {"seasonal": ("tol", 6e-7), "mean_abs_residual": ("tol", 6e-3)})


# ------------------------------------------------------------ q147 PMI
def q147():
    docs = table("documents")
    uni = defaultdict(int)
    bi = defaultdict(int)
    for text in docs.text:
        toks = text.split(" ")
        for t in toks:
            uni[t] += 1
        for a, b in zip(toks, toks[1:]):
            bi[a + " " + b] += 1
    tt = sum(uni.values())
    tb = sum(bi.values())
    scored = []
    for bg, n in bi.items():
        if n < 5:
            continue
        a, b = bg.split(" ")[0], bg.split(" ")[1]
        pmi = math.log2((n / tb) / ((uni[a] / tt) * (uni[b] / tt)))
        scored.append((pmi, bg, n))
    scored.sort(key=lambda t: (-t[0], t[1]))
    rows = [{"bigram": bg, "n": n, "pmi": rnd(pmi, 4)}
            for pmi, bg, n in scored[:20]]
    check("q147_collocations", rows, ["bigram"], {"pmi": ("tol", 6e-5)})


# ------------------------------------------------------------ q190 entropy
def q190():
    docs = table("documents")
    per_lang = defaultdict(lambda: defaultdict(int))
    for lang, text in zip(docs.lang, docs.text):
        d = per_lang[lang]
        for ch in text:
            d[ch] += 1
    rows = []
    for lang, d in per_lang.items():
        n = sum(d.values())
        h = math.log(n) - sum(c * math.log(c) for c in d.values()) / n
        rows.append({"lang": lang, "n_chars": n,
                     "distinct_chars": len(d),
                     "char_entropy": rnd(h, 3)})
    check("q190_char_entropy", rows, ["lang"],
          {"char_entropy": ("tol", 6e-4)})


# ------------------------------------------------------------ q240 Heaps
def q240():
    docs = table("documents")
    nid = int(max(docs.doc_id)) + 1
    first = {}
    for did, text in sorted(zip(docs.doc_id, docs.text)):
        toks = text.strip().split()
        grams = set(" ".join(toks[i:i + 3])
                    for i in range(len(toks) - 2)) if len(toks) >= 3 \
            else {" ".join(toks)}
        for g in grams:
            if g not in first:
                first[g] = int(did)
    dec = defaultdict(int)
    for d in first.values():
        dec[d * 10 // nid] += 1
    rows, cum = [], 0
    for b in sorted(dec):
        cum += dec[b]
        rows.append({"decile": b, "vocab_added": dec[b], "cum_vocab": cum})
    check("q240_heaps_curve", rows, ["decile"], {})


# ------------------------------------------------------------ q246 burst
def q246():
    ev = table("events")
    # normalize to MICROsecond ticks regardless of pandas' resolution
    us = pd.to_datetime(ev.ts).astype("datetime64[us]").astype("int64").tolist()
    per_user = defaultdict(list)
    for uid, t in zip(ev.user_id, us):
        per_user[uid].append(t)
    hist = defaultdict(int)
    for ts_list in per_user.values():
        ts_list.sort()
        peak = 0
        j = 0
        for i, t in enumerate(ts_list):
            while ts_list[j] < t:        # anchor window [t, t + 1h)
                j += 1
            hi = i
            while hi + 1 < len(ts_list) and ts_list[hi + 1] < t + 3_600_000_000:
                hi += 1
            peak = max(peak, hi - j + 1)
        hist[peak] += 1
    rows = [{"peak_burst": p, "n_users": n} for p, n in hist.items()]
    check("q246_burstiness", rows, ["peak_burst"], {})


# ------------------------------------------------------------ q302 MRL
def q302():
    vecs = embeddings()
    hist = defaultdict(int)
    anchors = [(v, e) for v, e, _ in vecs if v < 128]
    for a_id, ea in anchors:
        pairs = [(b_id, rnd(cos(ea, eb), 4), rnd(cos(ea[:16], eb[:16]), 4))
                 for b_id, eb, _ in vecs if b_id != a_id]
        top_full = {b for b, _, _ in
                    sorted(pairs, key=lambda t: (-t[1], t[0]))[:10]}
        top_trunc = {b for b, _, _ in
                     sorted(pairs, key=lambda t: (-t[2], t[0]))[:10]}
        hist[len(top_full & top_trunc)] += 1
    rows = [{"n_common": c, "n_anchors": n,
             "recall_at_k": rnd(c / 10.0, 4)} for c, n in hist.items()]
    check("q302_matryoshka_recall", rows, ["n_common"], {})


# ------------------------------------------------------------ q310 coherence
def q310():
    docs = table("documents")
    cnt = defaultdict(int)
    doc_toks = []
    for did, src, text in zip(docs.doc_id, docs.source, docs.text):
        toks = text.split(" ")
        for t in toks:
            cnt[(src, t)] += 1
        doc_toks.append((did, set(toks)))
    n_docs = len(doc_toks)
    top = defaultdict(list)
    for (src, t), n in sorted(cnt.items(), key=lambda kv: (kv[0][0],
                                                           -kv[1], kv[0][1])):
        if len(top[src]) < 5:
            top[src].append(t)
    sel = {t for ts in top.values() for t in ts}
    df = defaultdict(int)
    co = defaultdict(int)
    for _, toks in doc_toks:
        present = sorted(toks & sel)
        for t in present:
            df[t] += 1
        for i, a in enumerate(present):
            for b in present[i + 1:]:
                co[(a, b)] += 1
    rows = []
    for src, ts in top.items():
        pmis, zero = [], 0
        ts_sorted = sorted(ts)
        for i, a in enumerate(ts_sorted):
            for b in ts_sorted[i + 1:]:
                ab = co.get((a, b), 0)
                if ab == 0:
                    zero += 1
                else:
                    pmis.append(math.log2(ab * n_docs / (df[a] * df[b])))
        n_pairs = len(pmis) + zero
        rows.append({"source": src, "n_pairs": n_pairs,
                     "n_zero_pairs": zero,
                     "mean_pmi": rnd(sum(pmis) / len(pmis), 4)
                     if pmis else None})
    check("q310_source_coherence", rows, ["source"],
          {"mean_pmi": ("tol", 6e-5)})


CHECKS = [q147, q168, q185, q190, q208, q209, q210, q211, q213, q216,
          q240, q243, q246, q270, q274, q275, q283, q287, q288, q300,
          q302, q303, q306, q308, q310, q311, q313]

for fn in CHECKS:
    try:
        fn()
    except Exception as ex:                      # noqa: BLE001
        name = fn.__name__
        results[name] = {"status": "ERROR", "detail": repr(ex)}
        print(f"ERROR {name}: {ex!r}")

n_ok = sum(1 for r in results.values() if r["status"] == "OK")
print(f"\n{n_ok}/{len(results)} independent recomputes agree")
if REPORT:
    with open(REPORT, "w") as f:
        json.dump({"sf": SF, "n_ok": n_ok, "n": len(results),
                   "queries": results}, f, indent=1, default=str)
    print(f"wrote {REPORT}")
sys.exit(0 if n_ok == len(results) else 1)
