"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in wsid_ray) calls ray.init()/ray.shutdown().

The primary input table — `transcripts` (BASELINE.json:15) — does not
exist in /root/testdata, so it is synthesised deterministically per scale
by wsid_ray.fixtures (seed=42, closed vocab; FIXTURES.md F1) under
/tmp/wsid_ray_data.  SQL-checked transcript queries point DuckDB at the
same generated parquet via read_parquet('<path>/*.parquet'); calling
``queries()`` / ``oracle_sql()`` triggers (idempotent, atomic) generation
so both sides always see identical bytes.

Since round 4 the induced sense inventory ITSELF is SQL-checked: the
cw.py v2 integer determinism contract (RNG-free synchronous monotone
label propagation over int64 micro-unit weights; bounded-round HyperLex
hub/attach fixpoints) lets _sql_sense_inventory unroll the clustering
into CTE rounds, the same move as the k-means Lloyd mirror.  The only
remaining rows-only registrations are the approximate-by-design IVF/LSH
ANN hit lists (quality surfaced via the hash-checked ``knn_recall``
row) and the stubbed media codec.  Everything DOWNSTREAM of the
inventory is also SQL-checked: mentions_linked / canon_map / triples /
triples_checkpointed read the engine's deterministic inventory + KB
artifacts (wsid_ray/artifacts.py) and mirror scoring, entity linking,
union-find reachability and triple assembly in DuckDB
(_sql_linked_mentions / _sql_canon_chain / _sql_triples).  Everything
else — minhash, simhash, langid, jaccard, near-dup components, the
cooc/NPMI path, the relational/windowed queries — carries a hash-exact
DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship KG pipeline on sf0.001-scale transcripts -> triples."""
    from wsid_ray.runtime import configure
    from wsid_ray.pipelines.flagship import flagship_triples
    configure()
    return flagship_triples("sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from wsid_ray.runtime import configure
    from wsid_ray.fixtures import generate
    from wsid_ray.pipelines.queries import QUERIES
    configure()
    generate("sf0.01")   # make sure the SQL side's parquet exists
    return dict(QUERIES)


# planted-duplicate derived corpus (stages/setsim.py module docstring):
# a pure SQL transform of the driver's documents table — exact dups via
# case/whitespace perturbation, near-dups via an 80%-prefix cut.  The
# engine's planted_docs() builds the identical rows.
_SQL_PLANTED = """planted AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, ' ' || upper(text) || '  '
                FROM documents WHERE doc_id % 7 = 0
                UNION ALL
                SELECT doc_id + 2000000,
                       substr(text, 1, (length(text) * 4) // 5)
                FROM documents WHERE doc_id % 11 = 0
            )"""


def _sql_token_expr(col: str = "text") -> str:
    """DuckDB mirror of wsid_ray.stages.tokenize.tokenize_column."""
    from wsid_ray.config import MIN_TOKEN_LEN, STOPWORDS
    stop = ", ".join(f"'{s}'" for s in sorted(STOPWORDS))
    return (f"list_filter(regexp_split_to_array(lower({col}), "
            f"'[^a-z0-9_]+'), t -> length(t) >= {MIN_TOKEN_LEN} "
            f"AND t NOT IN ({stop}))")


def _sql_multi_terms():
    """(conds, m, term) per multi-word gazetteer entry: SQL conditions on
    the pos CTE matching the token sequence starting at 1-based p."""
    from wsid_ray.config import GAZETTEER
    out = []
    for g in sorted(GAZETTEER):
        if " " not in g:
            continue
        seq = g.split()
        conds = [f"tok = '{seq[0]}'"] + [
            f"tokens[p + {j}] = '{seq[j]}'" for j in range(1, len(seq))]
        out.append((" AND ".join(conds), len(seq), g))
    return out


def _sql_cooc_chain(tr: str, tok: str, gaz: str) -> str:
    """CTE chain (``toks`` … ``weighted``) mirroring the flagship cooc
    path (stages/mentions.py windows + stages/cooc.py counts/NPMI):
    windows are the W tokens either side of each gazetteer occurrence
    (single-token or multi-word span) within a turn, span excluded;
    counts are per-window-distinct; pmi/npmi per Bouma 2009 with the
    same float64 operation order as the numpy kernel.  Shared by
    _sql_cooc_edges and _sql_sense_inventory."""
    from wsid_ray.config import COOC_MIN_COUNT, WINDOW_SIZE
    W = WINDOW_SIZE
    multi_sql = "".join(f"""
            UNION ALL
            SELECT '{term}' AS term,
                   list_distinct(list_concat(
                       list_slice(tokens, greatest(1, p - {W}), p - 1),
                       list_slice(tokens, p + {m},
                                  least(len(tokens), p + {m - 1} + {W}))
                   )) AS wtoks
            FROM pos WHERE {conds}"""
        for conds, m, term in _sql_multi_terms())
    return f"""
        toks AS (
            SELECT {tok} AS tokens FROM {tr}
        ),
        pos AS (
            SELECT tokens, unnest(tokens) AS tok,
                   generate_subscripts(tokens, 1) AS p
            FROM toks
        ),
        wins0 AS (
            SELECT tok AS term,
                   list_distinct(list_concat(
                       list_slice(tokens, greatest(1, p - {W}), p - 1),
                       list_slice(tokens, p + 1, least(len(tokens), p + {W}))
                   )) AS wtoks
            FROM pos WHERE tok IN ({gaz}){multi_sql}
        ),
        -- MATERIALIZED: win_id comes from row_number(), so the CTE must
        -- be evaluated exactly once (DuckDB inlines plain CTEs, and two
        -- inlined evaluations of a UNION ALL can order differently,
        -- breaking the ex-to-ex self-join below)
        wins AS MATERIALIZED (
            SELECT row_number() OVER () AS win_id, term, wtoks
            FROM wins0),
        ex AS (SELECT win_id, term, unnest(wtoks) AS tok FROM wins),
        paircnt AS (
            SELECT a.term, a.tok AS w, b.tok AS v, count(*) AS n
            FROM ex a JOIN ex b ON a.win_id = b.win_id AND a.tok < b.tok
            GROUP BY a.term, a.tok, b.tok
        ),
        unicnt AS (SELECT term, tok, count(*) AS n_w FROM ex
                   GROUP BY term, tok),
        totcnt AS (SELECT term, count(*) AS nn FROM wins GROUP BY term),
        weighted AS (
            SELECT p.term, p.w, p.v, p.n,
                   ln((CAST(p.n AS DOUBLE) * t.nn)
                      / (CAST(uw.n_w AS DOUBLE) * uv.n_w)) AS pmi,
                   CASE WHEN p.n = t.nn THEN 1.0
                        ELSE ln((CAST(p.n AS DOUBLE) * t.nn)
                                / (CAST(uw.n_w AS DOUBLE) * uv.n_w))
                             / (-ln(CAST(p.n AS DOUBLE) / t.nn)) END AS npmi
            FROM paircnt p
            JOIN totcnt t ON t.term = p.term
            JOIN unicnt uw ON uw.term = p.term AND uw.tok = p.w
            JOIN unicnt uv ON uv.term = p.term AND uv.tok = p.v
            WHERE p.n >= {COOC_MIN_COUNT}
        )
    """


def _sql_cooc_edges(tr: str, tok: str, gaz: str) -> str:
    """DuckDB mirror of the flagship NPMI edge list (see
    _sql_cooc_chain for the shared window/count/weight CTEs)."""
    from wsid_ray.config import NPMI_MIN
    return f"""
        WITH {_sql_cooc_chain(tr, tok, gaz)}
        SELECT term, w, v, n, round(pmi, 6) AS pmi, round(npmi, 6) AS npmi
        FROM weighted WHERE npmi > {NPMI_MIN}
    """


def _sql_sense_label_ctes(algo: str = "cw"):
    """(ctes, fin): the quantised-edge / node-index / directed-
    adjacency CTEs plus the bounded-round label-propagation chain
    (CW or HyperLex) under the v2 integer contract — shared by
    _sql_sense_inventory and _sql_sense_modularity."""
    from wsid_ray.config import (CW_ITERATIONS,
                                 HYPERLEX_ATTACH_ROUNDS,
                                 HYPERLEX_HUB_ROUNDS, NPMI_MIN)
    ctes = [f"""edges AS (
            SELECT term, w, v,
                   CAST(floor(npmi * 1e6 + 0.5) AS BIGINT) AS wq
            FROM weighted WHERE npmi > {NPMI_MIN})""",
            """nd AS MATERIALIZED (
            SELECT term, node,
                   CAST(row_number() OVER (PARTITION BY term
                        ORDER BY node) - 1 AS BIGINT) AS nid
            FROM (SELECT term, w AS node FROM edges
                  UNION SELECT term, v FROM edges))""",
            """dir AS MATERIALIZED (
            SELECT e.term, nu.nid AS u, nv.nid AS v, e.wq
            FROM edges e
            JOIN nd nu ON nu.term = e.term AND nu.node = e.w
            JOIN nd nv ON nv.term = e.term AND nv.node = e.v
            UNION ALL
            SELECT e.term, nv.nid, nu.nid, e.wq
            FROM edges e
            JOIN nd nu ON nu.term = e.term AND nu.node = e.w
            JOIN nd nv ON nv.term = e.term AND nv.node = e.v)"""]
    if algo == "cw":
        ctes.append("l0 AS (SELECT term, nid AS node, nid AS lab FROM nd)")
        for r in range(1, CW_ITERATIONS + 1):
            ctes.append(f"""a{r} AS (
                SELECT term, node, nl FROM (
                    SELECT d.term, d.u AS node, p.lab AS nl,
                           sum(d.wq) AS s
                    FROM dir d JOIN l{r - 1} p
                      ON p.term = d.term AND p.node = d.v
                    GROUP BY d.term, d.u, p.lab)
                QUALIFY row_number() OVER (PARTITION BY term, node
                    ORDER BY s DESC, nl ASC) = 1)""")
            ctes.append(f"""l{r} AS MATERIALIZED (
                SELECT p.term, p.node, least(p.lab, a.nl) AS lab
                FROM l{r - 1} p JOIN a{r} a
                  ON a.term = p.term AND a.node = p.node)""")
        fin = f"l{CW_ITERATIONS}"
    elif algo == "hyperlex":
        ctes.append("""wdg AS (
            SELECT term, u AS node, sum(wq) AS wd
            FROM dir GROUP BY term, u)""")
        ctes.append("""rnk AS MATERIALIZED (
            SELECT term, node, row_number() OVER (PARTITION BY term
                ORDER BY wd DESC, node ASC) AS rk
            FROM wdg)""")
        # directed higher-rank adjacency: u -> neighbours ranked above u
        ctes.append("""hd AS MATERIALIZED (
            SELECT d.term, d.u, d.v
            FROM dir d
            JOIN rnk ru ON ru.term = d.term AND ru.node = d.u
            JOIN rnk rv ON rv.term = d.term AND rv.node = d.v
            WHERE rv.rk < ru.rk)""")
        # status: 0=UNDECIDED 1=HUB 2=NOT (all nodes have wdeg>0 here —
        # every node comes from a pruned edge with wq >= 1)
        ctes.append("s0 AS (SELECT term, nid AS node, 0 AS st FROM nd)")
        for r in range(1, HYPERLEX_HUB_ROUNDS + 1):
            ctes.append(f"""g{r} AS (
                SELECT h.term, h.u AS node,
                       max(CASE WHEN p.st = 1 THEN 1 ELSE 0 END) AS any_hub,
                       min(CASE WHEN p.st = 2 THEN 1 ELSE 0 END) AS all_not
                FROM hd h JOIN s{r - 1} p
                  ON p.term = h.term AND p.node = h.v
                GROUP BY h.term, h.u)""")
            ctes.append(f"""s{r} AS MATERIALIZED (
                SELECT p.term, p.node,
                       CASE WHEN p.st <> 0 THEN p.st
                            WHEN g.node IS NULL THEN 1
                            WHEN g.any_hub = 1 THEN 2
                            WHEN g.all_not = 1 THEN 1
                            ELSE 0 END AS st
                FROM s{r - 1} p LEFT JOIN g{r} g
                  ON g.term = p.term AND g.node = p.node)""")
        ctes.append(f"""t0 AS (
            SELECT term, node, CASE WHEN st = 1 THEN node END AS lab
            FROM s{HYPERLEX_HUB_ROUNDS})""")
        for r in range(1, HYPERLEX_ATTACH_ROUNDS + 1):
            ctes.append(f"""b{r} AS (
                SELECT term, node, lab FROM (
                    SELECT d.term, d.u AS node, p.lab, d.wq
                    FROM dir d JOIN t{r - 1} p
                      ON p.term = d.term AND p.node = d.v
                    WHERE p.lab IS NOT NULL)
                QUALIFY row_number() OVER (PARTITION BY term, node
                    ORDER BY wq DESC, lab ASC) = 1)""")
            ctes.append(f"""t{r} AS MATERIALIZED (
                SELECT p.term, p.node, coalesce(p.lab, b.lab) AS lab
                FROM t{r - 1} p LEFT JOIN b{r} b
                  ON b.term = p.term AND b.node = p.node)""")
        ctes.append(f"""fin_hx AS (
            SELECT term, node, coalesce(lab, node) AS lab
            FROM t{HYPERLEX_ATTACH_ROUNDS})""")
        fin = "fin_hx"
    else:
        raise ValueError(f"unknown induction algorithm {algo!r}")
    return ctes, fin


def _sql_sense_inventory(tr: str, tok: str, gaz: str,
                         algo: str = "cw") -> str:
    """DuckDB mirror of the induced sense inventory itself (VERDICT r03
    item 1) — the graph clustering unrolled into CTE rounds under the
    v2 integer determinism contract (wsid_ray/cw.py docstring), the
    same move as the k-means Lloyd mirror (_sql_kmeans):

      * edge weights quantised to int64 micro-units
        ``floor(npmi*1e6 + 0.5)`` on the bit-identical npmi doubles of
        the shared cooc chain;
      * nodes indexed per term in lexicographic order (``nid``), so
        integer label order == node-name order;
      * algo='cw': CW_ITERATIONS synchronous monotone rounds — each
        node's attractor is the neighbour label with maximal summed
        incident weight (ties → lowest label), adopted only if smaller
        than the current label.  The engine early-exits at a fixpoint;
        a fixpoint is stable, so the mirror always running the full cap
        computes the identical labelling;
      * algo='hyperlex': HYPERLEX_HUB_ROUNDS synchronous rounds of
        greedy maximal-independent-set hub selection by (wdeg desc,
        name asc) rank, then HYPERLEX_ATTACH_ROUNDS rounds attaching
        unlabelled nodes to the strongest labelled neighbour (weight
        desc, label asc); leftovers become singletons;
      * renumbering by (cluster size desc, min member asc); vector
        weight = intra-cluster incident micro-unit sum / 1e6, top
        SENSE_TOP_K per sense by (weight desc, token asc).
    """
    from wsid_ray.config import (CW_ITERATIONS, HYPERLEX_ATTACH_ROUNDS,
                                 HYPERLEX_HUB_ROUNDS, NPMI_MIN, SENSE_TOP_K)
    ctes, fin = _sql_sense_label_ctes(algo)
    ctes.append(f"""cl AS (
            SELECT term, lab, count(*) AS sz, min(node) AS mn
            FROM {fin} GROUP BY term, lab)""")
    ctes.append("""ren AS (
            SELECT term, lab,
                   CAST(row_number() OVER (PARTITION BY term
                        ORDER BY sz DESC, mn ASC) - 1 AS INTEGER)
                       AS sense_id
            FROM cl)""")
    ctes.append(f"""intra AS (
            SELECT d.term, d.u AS node, sum(d.wq) AS micro
            FROM dir d
            JOIN {fin} fu ON fu.term = d.term AND fu.node = d.u
            JOIN {fin} fv ON fv.term = d.term AND fv.node = d.v
            WHERE fu.lab = fv.lab
            GROUP BY d.term, d.u)""")
    ctes.append(f"""vec AS (
            SELECT f.term, r.sense_id, n.node AS token,
                   coalesce(i.micro, 0) AS micro
            FROM {fin} f
            JOIN ren r ON r.term = f.term AND r.lab = f.lab
            JOIN nd n ON n.term = f.term AND n.nid = f.node
            LEFT JOIN intra i ON i.term = f.term AND i.node = f.node)""")
    joined = ",\n        ".join(ctes)
    return f"""
        WITH {_sql_cooc_chain(tr, tok, gaz)},
        {joined}
        SELECT term, sense_id, token,
               round(CAST(micro AS DOUBLE) / 1000000.0, 6) AS weight
        FROM vec
        QUALIFY row_number() OVER (PARTITION BY term, sense_id
            ORDER BY micro DESC, token ASC) <= {SENSE_TOP_K}
    """


def _sql_sense_modularity(tr: str, tok: str, gaz: str,
                          algo: str = "cw") -> str:
    """DuckDB mirror of stages/induce.sense_modularity: weighted
    Newman modularity of the CW partition per term — the pure-integer
    identity Q·4m² = Σ_c (4m·e_c − d_c²) in HUGEINT (dir double-counts
    each edge, so Σ_dir intra = 2e_c and the numerator is
    Σ_c (2m·e2_c − d_c²)); only the final division is float, 6 dp
    half-up."""
    ctes, fin = _sql_sense_label_ctes(algo)
    ctes = list(ctes)
    ctes.append("""qm AS (SELECT term,
                         CAST(SUM(CAST(wq AS HUGEINT)) AS HUGEINT) AS m
                  FROM edges GROUP BY term)""")
    ctes.append(f"""qdc AS (
            SELECT d.term, fu.lab,
                   CAST(SUM(CAST(d.wq AS HUGEINT)) AS HUGEINT) AS dc
            FROM dir d
            JOIN {fin} fu ON fu.term = d.term AND fu.node = d.u
            GROUP BY d.term, fu.lab)""")
    ctes.append(f"""qec AS (
            SELECT d.term, fu.lab,
                   CAST(SUM(CAST(d.wq AS HUGEINT)) AS HUGEINT) AS e2
            FROM dir d
            JOIN {fin} fu ON fu.term = d.term AND fu.node = d.u
            JOIN {fin} fv ON fv.term = d.term AND fv.node = d.v
            WHERE fu.lab = fv.lab
            GROUP BY d.term, fu.lab)""")
    ctes.append("""qn AS (
            SELECT d.term,
                   SUM(2 * qm.m * coalesce(e.e2, 0) - d.dc * d.dc)
                       AS qnum
            FROM qdc d
            JOIN qm ON qm.term = d.term
            LEFT JOIN qec e ON e.term = d.term AND e.lab = d.lab
            GROUP BY d.term)""")
    ctes.append("""qnn AS (SELECT term, CAST(count(*) AS BIGINT)
                              AS n_nodes
                   FROM nd GROUP BY term)""")
    ctes.append(f"""qns AS (SELECT term,
                           CAST(count(DISTINCT lab) AS BIGINT)
                               AS n_senses
                    FROM {fin} GROUP BY term)""")
    joined = ",\n        ".join(ctes)
    return f"""
        WITH {_sql_cooc_chain(tr, tok, gaz)},
        {joined}
        SELECT q.term, qnn.n_nodes, qns.n_senses,
               CAST(qm.m AS BIGINT) AS m_micro,
               floor(CAST(q.qnum AS DOUBLE)
                     / CAST(4 * qm.m * qm.m AS DOUBLE) * 1e6 + 0.5)
                   / 1e6 AS q6
        FROM qn q
        JOIN qm ON qm.term = q.term
        JOIN qnn ON qnn.term = q.term
        JOIN qns ON qns.term = q.term
        WHERE qm.m > 0
    """


def _sql_doc_quality(stop: str) -> str:
    """DuckDB mirror of stages/textstats.quality_batch."""
    return rf"""
        SELECT doc_id, length(text) AS n_chars,
          coalesce(round(length(regexp_replace(text, '[^a-zA-Z]', '',
              'g')) * 1.0 / NULLIF(length(text), 0), 6), 0.0)
              AS alpha_ratio,
          coalesce(round(len(list_filter(list_filter(
              regexp_split_to_array(text, '\s+'), w -> w <> ''),
              w -> lower(w) IN ({stop}))) * 1.0
              / NULLIF(len(list_filter(regexp_split_to_array(text,
              '\s+'), w -> w <> '')), 0), 6), 0.0) AS stop_ratio,
          coalesce(round(list_aggregate(list_transform(list_filter(
              regexp_split_to_array(text, '\s+'), w -> w <> ''),
              w -> length(w)), 'sum') * 1.0
              / NULLIF(len(list_filter(regexp_split_to_array(text,
              '\s+'), w -> w <> '')), 0), 6), 0.0) AS avg_token_len
        FROM documents
    """


def _sql_doc_langid() -> str:
    """DuckDB mirror of stages/textstats.langid_batch: CJK codepoint scan
    on the first 500 chars, else marker-word argmax with first-wins ties
    in (en, de, fr, es) order; score = best/max(1, n_words), half-up 6dp."""
    from wsid_ray.stages.textstats import _LANG_MARKERS
    marks = {k: ", ".join(f"'{w}'" for w in v)
             for k, v in _LANG_MARKERS.items() if v}
    return rf"""
        WITH w AS (
            SELECT doc_id,
                   regexp_matches(substr(text, 1, 500),
                                  '[\x{{4e00}}-\x{{9fff}}]') AS is_zh,
                   list_filter(regexp_split_to_array(lower(text), '\s+'),
                               x -> x <> '') AS words
            FROM documents
        ),
        scored AS (
            SELECT doc_id, is_zh, greatest(1, len(words)) AS nw,
                len(list_filter(words, x -> x IN ({marks['en']}))) AS s_en,
                len(list_filter(words, x -> x IN ({marks['de']}))) AS s_de,
                len(list_filter(words, x -> x IN ({marks['fr']}))) AS s_fr,
                len(list_filter(words, x -> x IN ({marks['es']}))) AS s_es
            FROM w
        )
        SELECT doc_id,
            CASE WHEN is_zh THEN 'zh'
                 WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                 WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                 WHEN s_fr >= s_es THEN 'fr'
                 ELSE 'es' END AS lang_pred,
            CASE WHEN is_zh THEN 1.0
                 ELSE floor(CAST(greatest(s_en, s_de, s_fr, s_es) AS DOUBLE)
                            / nw * 1e6 + 0.5) / 1e6 END AS lang_score
        FROM scored
    """


def _sql_doc_langid_model(profile_path: str) -> str:
    """DuckDB mirror of the corpus-trained trigram langid model
    (wsid_ray/langprofile.py): both sides read the SAME profile parquet
    (integer lp_micro quantised once at training), score docs by exact
    int64 sums over trigram occurrences of the first-256-codepoint
    lowercased head (unseen trigram -> the language's tri='' default
    row), argmax with ties to the lexicographically smallest lang, score
    = floor(sum/n_tri + 0.5)/1e6; headless docs (n_tri = 0) -> ('und',
    0.0)."""
    return f"""
        WITH lm_prof AS MATERIALIZED (
            SELECT lang, tri, lp_micro
            FROM read_parquet('{profile_path}')),
        lm_def AS (SELECT lang, lp_micro AS def_lp FROM lm_prof
                   WHERE tri = ''),
        lm_d AS (SELECT doc_id, substr(lower(text), 1, 256) AS s
                 FROM documents),
        lm_ex AS (
            SELECT doc_id, substr(s, CAST(i AS INTEGER), 3) AS tri
            FROM (SELECT doc_id, s,
                         unnest(range(1, greatest(len(s) - 2, 0) + 1)) AS i
                  FROM lm_d)),
        lm_scored AS (
            SELECT e.doc_id, dd.lang,
                   CAST(sum(coalesce(p.lp_micro, dd.def_lp)) AS BIGINT)
                       AS s_micro,
                   CAST(count(*) AS BIGINT) AS n_tri
            FROM lm_ex e
            CROSS JOIN lm_def dd
            LEFT JOIN lm_prof p ON p.lang = dd.lang AND p.tri = e.tri
            GROUP BY 1, 2),
        lm_best AS (
            SELECT doc_id, lang, s_micro, n_tri,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY s_micro DESC, lang ASC)
                       AS rn
            FROM lm_scored)
        SELECT d.doc_id,
               coalesce(b.lang, 'und') AS lang_pred,
               coalesce(floor(b.s_micro / b.n_tri + 0.5) / 1e6, 0.0)
                   AS lang_score
        FROM lm_d d
        LEFT JOIN lm_best b ON b.doc_id = d.doc_id AND b.rn = 1
    """


def _sql_doc_simhash(tok: str) -> str:
    """DuckDB mirror of stages/textstats.simhash_batch: per-token 64-bit
    hash = md5_number_upper (first 8 digest bytes little-endian),
    occurrence-weighted sign-sum per bit, sign bits packed into int64."""
    return f"""
        WITH d AS (SELECT doc_id, {tok} AS toks FROM documents),
        ex AS (SELECT doc_id, unnest(toks) AS tok FROM d),
        tokc AS (SELECT doc_id, tok, count(*) AS c FROM ex
                 GROUP BY doc_id, tok),
        hashed AS (SELECT doc_id, c, md5_number_upper(tok) AS h FROM tokc),
        bits AS (
            SELECT doc_id, bb.b AS b,
                   sum(CASE WHEN (h >> bb.b) & 1 = 1 THEN c ELSE -c END)
                       AS acc
            FROM hashed, (SELECT unnest(range(64)) AS b) bb
            GROUP BY doc_id, bb.b
        ),
        sums AS (
            SELECT doc_id,
                   sum(CASE WHEN acc > 0 THEN CAST(1 AS UBIGINT) << b
                            ELSE CAST(0 AS UBIGINT) END) AS s
            FROM bits GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(
                   CASE WHEN s.s >= CAST(9223372036854775808 AS HUGEINT)
                        THEN s.s - CAST(18446744073709551616 AS HUGEINT)
                        ELSE s.s END, 0) AS BIGINT) AS simhash
        FROM d LEFT JOIN sums s USING (doc_id)
    """


def _sql_shingles(tok: str, k: int) -> str:
    """Per-doc distinct shingle strings (mirror of dedup._shingle_strings)."""
    return f"""
        SELECT doc_id,
               CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                    WHEN len(toks) < {k} THEN [array_to_string(toks, ' ')]
                    ELSE list_distinct(list_transform(
                        range(len(toks) - {k} + 1),
                        i -> array_to_string(
                            list_slice(toks, i + 1, i + {k}), ' ')))
               END AS shingles
        FROM (SELECT doc_id, {tok} AS toks FROM documents)
    """


def _sql_minhash_chain(tok: str, k: int = 3, num_perm: int = 64,
                       num_bands: int = 16) -> str:
    """Shared CTE block (``th`` … ``bands``) of the MinHash mirrors:
    30-bit md5 token hashes folded per k-gram by s -> (s*31 + t) % 2^30
    (exact BIGINT math, same as the engine's int64 fold), (a*x+b) %
    (2^31-1) permutations with the engine's inlined RandomState(42)
    constants, md5 band fingerprints."""
    from wsid_ray.stages.dedup import _SHINGLE_MOD, _perm_params
    a, b = _perm_params(num_perm)
    vals = ", ".join(f"({j}, {int(a[j])}, {int(b[j])})"
                     for j in range(num_perm))
    rpb = num_perm // num_bands
    fold = "h[i + 1]"
    for j in range(2, k + 1):
        fold = f"(({fold}) * 31 + h[i + {j}]) % {_SHINGLE_MOD}"
    return f"""th AS (
            SELECT doc_id, toks,
                   list_transform(toks, y ->
                       CAST((md5_number_upper(y) >> 34) AS BIGINT)) AS h
            FROM (SELECT doc_id, {tok} AS toks FROM documents)
        ),
        shd AS (
            SELECT DISTINCT doc_id, x FROM (
                SELECT doc_id,
                       unnest(list_transform(range(len(toks) - {k} + 1),
                              i -> {fold})) AS x
                FROM th WHERE len(toks) >= {k}
                UNION ALL
                SELECT doc_id,
                       CAST((md5_number_upper(array_to_string(toks, ' '))
                             >> 34) AS BIGINT) AS x
                FROM th WHERE len(toks) > 0 AND len(toks) < {k}
            )
        ),
        perms AS (SELECT * FROM (VALUES {vals}) p(j, a, b)),
        sigs AS (
            SELECT doc_id, p.j AS j,
                   min((p.a * x + p.b) % 2147483647) AS v
            FROM shd, perms p GROUP BY doc_id, p.j
        ),
        bands AS (
            SELECT doc_id, CAST(j // {rpb} AS INT) AS band_id,
                   CAST((md5_number_upper(string_agg(CAST(v AS VARCHAR),
                            ',' ORDER BY j))
                         & CAST(9223372036854775807 AS UBIGINT))
                        AS BIGINT) AS band_hash
            FROM sigs GROUP BY doc_id, j // {rpb}
        )"""


def _sql_minhash_candidates(tok: str, k: int = 3, num_perm: int = 64,
                            num_bands: int = 16) -> str:
    """DuckDB mirror of dedup.minhash_candidates: pairs sharing any
    band bucket (chain CTEs in _sql_minhash_chain)."""
    return f"""
        WITH {_sql_minhash_chain(tok, k, num_perm, num_bands)}
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band_id = b.band_id
                    AND a.band_hash = b.band_hash
                    AND a.doc_id < b.doc_id
    """


def _sql_minhash_est(tok: str, k: int = 3, num_perm: int = 64,
                     num_bands: int = 16) -> str:
    """DuckDB mirror of dedup.minhash_jaccard_estimate: per candidate
    pair, matching-signature-position count, the micro-unit estimate
    n_match * 1e6 // num_perm, the exact shingle Jaccard in micro-units
    (same float op order as the engine: plain DOUBLE division then
    floor(x*1e6+0.5)), and the absolute error — zero-intersection
    false-positive candidates kept."""
    return f"""
        WITH {_sql_minhash_chain(tok, k, num_perm, num_bands)},
        cands AS MATERIALIZED (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b ON a.band_id = b.band_id
                        AND a.band_hash = b.band_hash
                        AND a.doc_id < b.doc_id),
        m AS (
            SELECT c.doc_a, c.doc_b,
                   CAST(count(*) FILTER (sa.v = sb.v) AS BIGINT)
                       AS n_match
            FROM cands c
            JOIN sigs sa ON sa.doc_id = c.doc_a
            JOIN sigs sb ON sb.doc_id = c.doc_b AND sb.j = sa.j
            GROUP BY c.doc_a, c.doc_b),
        ex AS (
            SELECT c.doc_a, c.doc_b,
                   CAST(floor(
                       CAST(len(list_intersect(ha.shingles, hb.shingles))
                            AS DOUBLE)
                       / (len(ha.shingles) + len(hb.shingles)
                          - len(list_intersect(ha.shingles, hb.shingles)))
                       * 1e6 + 0.5) AS BIGINT) AS jacc_micro
            FROM cands c
            JOIN ({_sql_shingles(tok, k)}) ha ON ha.doc_id = c.doc_a
            JOIN ({_sql_shingles(tok, k)}) hb ON hb.doc_id = c.doc_b)
        SELECT m.doc_a, m.doc_b, m.n_match,
               m.n_match * 1000000 // {num_perm} AS est_micro,
               ex.jacc_micro,
               abs(m.n_match * 1000000 // {num_perm} - ex.jacc_micro)
                   AS err_micro
        FROM m JOIN ex ON ex.doc_a = m.doc_a AND ex.doc_b = m.doc_b
    """


def _sql_lsh_bucket_stats(tok: str, k: int = 3, num_perm: int = 64,
                          num_bands: int = 16) -> str:
    """DuckDB mirror of dedup.lsh_bucket_stats: band-bucket size
    histogram."""
    return f"""
        WITH {_sql_minhash_chain(tok, k, num_perm, num_bands)},
        bsz AS (SELECT band_id, band_hash,
                       CAST(count(*) AS BIGINT) AS bucket_size
                FROM bands GROUP BY band_id, band_hash)
        SELECT bucket_size, CAST(count(*) AS BIGINT) AS n_buckets
        FROM bsz GROUP BY bucket_size
    """


def _sql_jaccard_pairs(tok: str, threshold: float = 0.5,
                       k: int = 3) -> str:
    """Candidates (same LSH as the engine) -> exact shingle-set Jaccard."""
    return f"""
        SELECT doc_a, doc_b, floor(j * 1e6 + 0.5) / 1e6 AS jaccard
        FROM (
            SELECT c.doc_a, c.doc_b,
                   CAST(len(list_intersect(sa.shingles, sb.shingles))
                        AS DOUBLE)
                   / (len(sa.shingles) + len(sb.shingles)
                      - len(list_intersect(sa.shingles, sb.shingles))) AS j
            FROM ({_sql_minhash_candidates(tok, k)}) c
            JOIN ({_sql_shingles(tok, k)}) sa ON sa.doc_id = c.doc_a
            JOIN ({_sql_shingles(tok, k)}) sb ON sb.doc_id = c.doc_b
        ) WHERE j >= {threshold}
    """


def _sql_linked_mentions(tr: str, tok: str, gaz: str,
                         inv_path: str, kb_path: str) -> str:
    """DuckDB mirror of the flagship chain DOWNSTREAM of the induced
    inventory (stages/mentions.py detection + stages/disambig.py scoring
    and entity linking), reading the engine's deterministic inventory /
    KB-profile artifacts (wsid_ray/artifacts.py):

      * mentions: every gazetteer term matches independently at every
        token position (overlaps allowed, no cross-turn sequences);
        window = W raw (non-distinct) tokens each side, span excluded;
        spans 0-based.
      * score(mention, sense) = Σ weight over window-token ⋈ inventory,
        half-up 6dp (shared rounding rule); keep scores > MIN_LINK_SCORE;
        argmax ties → lowest sense_id; no surviving sense → sense_id -1,
        score 0.
      * kb link: per (term, sense) argmax of Σ sense-vector weight over
        the candidate's profile tokens, ALL candidates participate
        (zero-overlap scores 0), ties → lexicographically smallest kb_id
        (disambig.build_link_map).

    Returns a SELECT producing the mentions_linked schema.  Embed inside
    ``WITH RECURSIVE`` queries via the men/scores CTE names — all CTE
    names here are prefixed ``lm_`` to avoid collisions.
    """
    from wsid_ray.config import MIN_LINK_SCORE, WINDOW_SIZE
    W = WINDOW_SIZE
    multi_sql = "".join(f"""
            UNION ALL
            SELECT conv_id, turn_idx, role, tool, ts, tokens, p,
                   {m} AS m, '{term}' AS term
            FROM lm_pos WHERE {conds}"""
        for conds, m, term in _sql_multi_terms())
    return f"""
        WITH lm_base AS (
            SELECT conv_id, turn_idx, role, tool, ts, {tok} AS tokens
            FROM {tr}
        ),
        lm_pos AS (
            SELECT conv_id, turn_idx, role, tool, ts, tokens,
                   unnest(tokens) AS tok,
                   generate_subscripts(tokens, 1) AS p
            FROM lm_base
        ),
        lm_men0 AS (
            SELECT conv_id, turn_idx, role, tool, ts, tokens, p,
                   1 AS m, tok AS term
            FROM lm_pos WHERE tok IN ({gaz}){multi_sql}
        ),
        -- MATERIALIZED: mid comes from row_number(), must be evaluated
        -- exactly once (same lesson as the cooc win_id CTE)
        lm_men AS MATERIALIZED (
            SELECT row_number() OVER () AS mid,
                   conv_id, turn_idx, role, tool, ts, term,
                   CAST(p - 1 AS INTEGER) AS span_start,
                   CAST(p - 1 + m AS INTEGER) AS span_end,
                   list_concat(
                       list_slice(tokens, greatest(1, p - {W}), p - 1),
                       list_slice(tokens, p + m,
                                  least(len(tokens), p + m - 1 + {W}))
                   ) AS wtoks
            FROM lm_men0
        ),
        lm_inv AS (SELECT * FROM read_parquet('{inv_path}')),
        lm_kb AS (SELECT * FROM read_parquet('{kb_path}')),
        lm_scores AS (
            SELECT e.mid, i.sense_id,
                   floor(sum(i.weight) * 1e6 + 0.5) / 1e6 AS s
            FROM (SELECT mid, term, unnest(wtoks) AS wtok FROM lm_men) e
            JOIN lm_inv i ON i.term = e.term AND i.token = e.wtok
            GROUP BY e.mid, i.sense_id
        ),
        lm_best AS (
            SELECT mid, sense_id, s FROM lm_scores
            WHERE s > {MIN_LINK_SCORE}
            QUALIFY row_number() OVER (
                PARTITION BY mid ORDER BY s DESC, sense_id) = 1
        ),
        lm_sensecand AS (
            SELECT i.term, i.sense_id, k.kb_id
            FROM (SELECT DISTINCT term, sense_id FROM lm_inv) i
            JOIN (SELECT DISTINCT term, kb_id FROM lm_kb) k
              USING (term)
        ),
        lm_ovl AS (
            SELECT i.term, i.sense_id, k.kb_id, sum(i.weight) AS s
            FROM lm_inv i
            JOIN lm_kb k ON k.term = i.term AND k.token = i.token
            GROUP BY i.term, i.sense_id, k.kb_id
        ),
        lm_link AS (
            SELECT sc.term, sc.sense_id, sc.kb_id
            FROM lm_sensecand sc
            LEFT JOIN lm_ovl o ON o.term = sc.term
                              AND o.sense_id = sc.sense_id
                              AND o.kb_id = sc.kb_id
            QUALIFY row_number() OVER (
                PARTITION BY sc.term, sc.sense_id
                ORDER BY coalesce(o.s, 0.0) DESC, sc.kb_id) = 1
        )
        SELECT m.conv_id, m.turn_idx, m.role, m.tool, m.ts, m.term,
               m.span_start, m.span_end,
               CAST(coalesce(b.sense_id, -1) AS INTEGER) AS sense_id,
               coalesce(b.s, 0.0) AS score,
               m.term || '#' ||
                   CAST(coalesce(b.sense_id, -1) AS VARCHAR) AS entity_id,
               CASE WHEN b.sense_id IS NULL THEN ''
                    ELSE coalesce(l.kb_id, '') END AS kb_id
        FROM lm_men m
        LEFT JOIN lm_best b USING (mid)
        LEFT JOIN lm_link l ON l.term = m.term AND l.sense_id = b.sense_id
    """


def _sql_canon_chain(linked_select: str) -> str:
    """Shared CTE block (for WITH RECURSIVE queries): linked mentions →
    distinct (entity_id, kb_id) edges → reachability closure → per-node
    component → canon_map (canon = lexicographically smallest ENTITY node
    of the component; kb: nodes link components but are not canonical ids
    — stages/unionfind.canonicalize)."""
    return f"""
        cn_linked AS MATERIALIZED ({linked_select}),
        cn_e0 AS (
            SELECT DISTINCT entity_id AS a, kb_id AS b FROM cn_linked
            WHERE sense_id >= 0 AND kb_id <> ''
        ),
        cn_edges AS (SELECT a, b FROM cn_e0
                     UNION SELECT b, a FROM cn_e0),
        cn_nodes AS (SELECT DISTINCT a AS node FROM cn_edges),
        cn_reach AS (
            SELECT node, node AS r FROM cn_nodes
            UNION
            SELECT e.a AS node, cn_reach.r
            FROM cn_edges e JOIN cn_reach ON cn_reach.node = e.b
        ),
        cn_comp AS (
            SELECT node, min(r) AS c FROM cn_reach GROUP BY node
        ),
        cn_map AS (
            SELECT node AS entity_id,
                   min(CASE WHEN node NOT LIKE 'kb:%' THEN node END)
                       OVER (PARTITION BY c) AS canon_id
            FROM cn_comp
            QUALIFY node NOT LIKE 'kb:%'
        )"""


def _sql_triples_chain(linked_select: str) -> str:
    """Shared CTE block of the triple mirrors (``cn_*`` … ``tr_all``):
    unary addresses/uses_tool rules + the within-turn ordered pair
    self-join on canonicalised entities (stages/triples.py), PRE-dedup."""
    from wsid_ray.config import (PRED_ADDRESSES, PRED_CO_MENTION,
                                 PRED_USES_TOOL)
    return f"""{_sql_canon_chain(linked_select)},
        tr_lm AS MATERIALIZED (
            SELECT l.conv_id, l.turn_idx, l.role, l.tool, l.ts,
                   l.term, l.span_start,
                   coalesce(c.canon_id, l.entity_id) AS ent
            FROM cn_linked l
            LEFT JOIN cn_map c ON c.entity_id = l.entity_id
            WHERE l.sense_id >= 0
        ),
        tr_unary AS (
            SELECT ent AS subj, '{PRED_ADDRESSES}' AS pred, role AS obj,
                   conv_id, turn_idx, ts
            FROM tr_lm
            UNION ALL
            SELECT ent, '{PRED_USES_TOOL}', tool, conv_id, turn_idx, ts
            FROM tr_lm WHERE tool <> ''
        ),
        tr_pairs AS (
            SELECT a.ent AS subj, '{PRED_CO_MENTION}' AS pred,
                   b.ent AS obj, a.conv_id, a.turn_idx, a.ts
            FROM tr_lm a
            JOIN tr_lm b ON a.conv_id = b.conv_id
                        AND a.turn_idx = b.turn_idx
            WHERE (a.span_start < b.span_start
                   OR (a.span_start = b.span_start AND a.term < b.term))
              AND a.ent <> b.ent
        ),
        tr_all AS (SELECT * FROM tr_unary
                   UNION ALL SELECT * FROM tr_pairs)"""


def _sql_triples(linked_select: str) -> str:
    """DuckDB mirror of triple assembly + exact dedup: first-provenance
    dedup on (subj, pred, obj) by (conv_id, turn_idx) over the shared
    chain."""
    return f"""
        WITH RECURSIVE {_sql_triples_chain(linked_select)}
        SELECT subj, pred, obj, conv_id, turn_idx, ts FROM tr_all
        QUALIFY row_number() OVER (
            PARTITION BY subj, pred, obj ORDER BY conv_id, turn_idx) = 1
    """


def _sql_triple_support(linked_select: str) -> str:
    """DuckDB mirror of the KG support/provenance rollup
    (pipelines/queries.q_triple_support): per canonical triple, raw
    occurrence count, distinct supporting conversations, first/last
    timestamp — over the PRE-dedup triple stream."""
    return f"""
        WITH RECURSIVE {_sql_triples_chain(linked_select)}
        SELECT subj, pred, obj, CAST(count(*) AS BIGINT) AS support,
               CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
               min(ts) AS first_ts, max(ts) AS last_ts
        FROM tr_all GROUP BY subj, pred, obj
    """


def _sql_order_price_histo(bin_cents: int = 100_000) -> str:
    """DuckDB mirror of analytics.order_price_histo: same fixed-width
    integer-cent bins, same exact-integer rank ceil(num*n/den), same
    first-bin-upper-edge readout — generated from the engine's
    _HISTO_QS so the quantile list can't drift."""
    from wsid_ray.pipelines.analytics import _HISTO_QS
    W = bin_cents
    picks = ",\n               ".join(
        f"min(CASE WHEN cum >= ({num}*n + {den - 1}) // {den} "
        f"THEN (bin + 1) * {W} END) AS {name}_ub_cents"
        for name, num, den in _HISTO_QS)
    return f"""
        WITH b AS (
            SELECT o_orderstatus,
                   CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) // {W}
                       AS bin,
                   count(*) AS c
            FROM orders GROUP BY o_orderstatus, bin
        ), cum AS (
            SELECT o_orderstatus, bin,
                   CAST(sum(c) OVER (PARTITION BY o_orderstatus
                        ORDER BY bin) AS BIGINT) AS cum,
                   CAST(sum(c) OVER (PARTITION BY o_orderstatus)
                        AS BIGINT) AS n
            FROM b
        )
        SELECT o_orderstatus, n AS n_orders,
               {picks}
        FROM cum GROUP BY o_orderstatus, n
    """


def _sql_events_hopping(size_min: int = 60, hop_min: int = 30) -> str:
    """DuckDB mirror of analytics.events_hopping, GENERATED from the same
    (size_min, hop_min) parameters as the engine function.  The first
    window start uses a floor-division-safe expression — DuckDB's integer
    ``//`` truncates toward zero while numpy floors, which diverges for
    events in the first ``size-hop`` minutes after the epoch (ADVICE r02).
    """
    k = size_min // hop_min
    shift = size_min - hop_min
    return f"""
        WITH ev AS (
            SELECT event_type,
                   CAST(floor(epoch(ts) / 60) AS BIGINT) AS m,
                   CAST(floor(value*100 + 0.5) AS BIGINT) AS vc
            FROM events
        ), ex AS (
            SELECT event_type, vc, m,
                   CAST(floor((m - {shift}) / {hop_min}.0) AS BIGINT)
                       * {hop_min} + ii.i * {hop_min} AS s
            FROM ev, (SELECT unnest(range({k})) AS i) ii
        )
        SELECT event_type,
               make_timestamp(s * 60 * 1000000) AS win_start,
               count(*) AS n,
               CAST(sum(vc) AS BIGINT) AS sum_value_cents
        FROM ex WHERE s <= m AND m < s + {size_min}
        GROUP BY event_type, s
    """


# exact brute-force cosine top-k over the fixed query set — used both as
# the knn_cosine_topk oracle and as the independent "exact" side of the
# knn_recall check
def _sql_cooc_pagerank(tr: str, tok: str, gaz: str, rounds: int = 5,
                       weighted: bool = False) -> str:
    """DuckDB mirror of stages/pagerank.pagerank_micro — the fixed
    synchronous rounds unrolled as CTE pairs (c{k}: integer
    contributions summed per target; r{k}: damping in exact integer
    arithmetic), same move as the k-means and CW mirrors.  ``weighted``
    mirrors the weighted contract: per-edge (r * wq) // W_u with wq =
    the NPMI edge weight in micro-units and W_u the incident sum."""
    from wsid_ray.config import NPMI_MIN
    contrib = ("SUM((r.r * e.wq) // d.deg)" if weighted
               else "SUM(r.r // d.deg)")
    rounds_sql, prev = "", "r0"
    for k in range(1, rounds + 1):
        rounds_sql += f""",
        c{k} AS (SELECT e.term, e.x AS node, {contrib} AS s
                 FROM ed e
                 JOIN {prev} r ON r.term = e.term AND r.node = e.u
                 JOIN deg d ON d.term = e.term AND d.u = e.u
                 GROUP BY e.term, e.x),
        r{k} AS (SELECT c.term, c.node,
                        CAST((15 * 1000000) // (100 * nn.n)
                             + (85 * c.s) // 100 AS BIGINT) AS r
                 FROM c{k} c JOIN nn ON nn.term = c.term)"""
        prev = f"r{k}"
    wq_sel = (", CAST(floor(npmi * 1e6 + 0.5) AS BIGINT) AS wq"
              if weighted else "")
    wq_ed = ", wq" if weighted else ""
    deg_expr = ("CAST(SUM(wq) AS BIGINT)" if weighted
                else "CAST(count(*) AS BIGINT)")
    return f"""
        WITH {_sql_cooc_chain(tr, tok, gaz)},
        edges0 AS (SELECT term, w, v{wq_sel} FROM weighted
                   WHERE npmi > {NPMI_MIN}),
        ed AS (SELECT term, w AS u, v AS x{wq_ed} FROM edges0
               UNION ALL SELECT term, v, w{wq_ed} FROM edges0),
        deg AS (SELECT term, u, {deg_expr} AS deg
                FROM ed GROUP BY term, u),
        nn AS (SELECT term, CAST(count(*) AS BIGINT) AS n
               FROM deg GROUP BY term),
        r0 AS (SELECT d.term, d.u AS node,
                      CAST(1000000 // nn.n AS BIGINT) AS r
               FROM deg d JOIN nn ON nn.term = d.term){rounds_sql}
        SELECT term, node, r AS rank_micro FROM {prev}
    """


def _sql_cooc_hits(tr: str, tok: str, gaz: str, rounds: int = 3) -> str:
    """DuckDB mirror of stages/pagerank.hits_micro — the fixed
    synchronous HITS rounds unrolled as CTE triples per half-step
    (ar/hr: integer neighbour sums, sa/sh: per-term L1 totals, ha/hh:
    the (raw·1e6)//total normalisation), the 8th bounded-iteration
    mirror after k-means / CW / PageRank / k-core / BFS / Markov /
    Lloyd-PQ.  ``ed`` and each raw CTE are AS MATERIALIZED — every one
    is referenced twice, so inlining would re-expand the cooc chain
    exponentially."""
    from wsid_ray.config import NPMI_MIN
    ctes, prev = "", "hh0"
    for k in range(1, rounds + 1):
        for tag, tot in (("a", "sa"), ("h", "sh")):
            raw, norm = f"{tag}r{k}", f"{tag}{tag}{k}"
            ctes += f""",
        {raw} AS MATERIALIZED (
            SELECT e.term, e.x AS node, CAST(SUM(r.v) AS BIGINT) AS s
            FROM ed e JOIN {prev} r
                 ON r.term = e.term AND r.node = e.u
            GROUP BY e.term, e.x),
        {tot}{k} AS (SELECT term, CAST(SUM(s) AS BIGINT) AS t
                     FROM {raw} GROUP BY term),
        {norm} AS (SELECT r.term, r.node,
                          CAST((r.s * 1000000) // s.t AS BIGINT) AS v
                   FROM {raw} r JOIN {tot}{k} s ON s.term = r.term)"""
            prev = norm
    return f"""
        WITH {_sql_cooc_chain(tr, tok, gaz)},
        he AS (SELECT term, w, v FROM weighted
               WHERE npmi > {NPMI_MIN}),
        ed AS MATERIALIZED (
            SELECT term, w AS u, v AS x FROM he
            UNION ALL SELECT term, v, w FROM he),
        hnodes AS (SELECT DISTINCT term, u FROM ed),
        hnn AS (SELECT term, CAST(count(*) AS BIGINT) AS n
                FROM hnodes GROUP BY term),
        hh0 AS (SELECT hnodes.term, hnodes.u AS node,
                       CAST(1000000 // hnn.n AS BIGINT) AS v
                FROM hnodes JOIN hnn ON hnn.term = hnodes.term){ctes}
        SELECT a.term, a.node, a.v AS auth_micro, h.v AS hub_micro
        FROM aa{rounds} a JOIN hh{rounds} h
             ON h.term = a.term AND h.node = a.node
    """


def _sql_cooc_ppr(tr: str, tok: str, gaz: str, rounds: int = 5) -> str:
    """DuckDB mirror of stages/pagerank.ppr_micro — personalized
    PageRank with all teleport mass at the per-term hub (deg desc,
    name asc — the bfs_hops seed rule), unrolled as c{k}/r{k} CTE
    pairs; the 9th bounded-iteration mirror.  Base term 150000 =
    (15*1e6)//100 lands only on the seed row."""
    from wsid_ray.config import NPMI_MIN
    ctes, prev = "", "pr0"
    for k in range(1, rounds + 1):
        ctes += f""",
        pc{k} AS (SELECT e.term, e.x AS node,
                         CAST(SUM(r.r // d.deg) AS BIGINT) AS s
                  FROM ped e
                  JOIN {prev} r ON r.term = e.term AND r.node = e.u
                  JOIN pdeg d ON d.term = e.term AND d.u = e.u
                  GROUP BY e.term, e.x),
        pr{k} AS (SELECT c.term, c.node,
                         CAST(CASE WHEN c.node = sd.node
                              THEN 150000 ELSE 0 END
                              + (85 * c.s) // 100 AS BIGINT) AS r
                  FROM pc{k} c JOIN pseed sd ON sd.term = c.term)"""
        prev = f"pr{k}"
    return f"""
        WITH {_sql_cooc_chain(tr, tok, gaz)},
        pe0 AS (SELECT term, w, v FROM weighted
                WHERE npmi > {NPMI_MIN}),
        ped AS MATERIALIZED (
            SELECT term, w AS u, v AS x FROM pe0
            UNION ALL SELECT term, v, w FROM pe0),
        pdeg AS MATERIALIZED (
            SELECT term, u, CAST(count(*) AS BIGINT) AS deg
            FROM ped GROUP BY term, u),
        pseed AS (SELECT term, u AS node
                  FROM (SELECT term, u, row_number() OVER (
                            PARTITION BY term ORDER BY deg DESC, u)
                            AS rk
                        FROM pdeg) WHERE rk = 1),
        pr0 AS (SELECT d.term, d.u AS node,
                       CAST(CASE WHEN d.u = sd.node THEN 1000000
                            ELSE 0 END AS BIGINT) AS r
                FROM pdeg d JOIN pseed sd ON sd.term = d.term){ctes}
        SELECT term, node, r AS ppr_micro FROM {prev}
    """


def _sql_term_context_drift(tr: str, tok: str, gaz: str) -> str:
    """DuckDB mirror of pipelines/queries.q_term_context_drift —
    mention windows WITH timestamps (single + multi-word spans, same
    slices as _sql_cooc_chain), midpoint-day split, then the JS
    micro-nat contract of source_js_divergence per term."""
    from wsid_ray.config import WINDOW_SIZE
    W = WINDOW_SIZE
    multi = "".join(f"""
            UNION ALL
            SELECT '{term}' AS term, ts,
                   list_distinct(list_concat(
                       list_slice(tokens, greatest(1, p - {W}), p - 1),
                       list_slice(tokens, p + {m},
                                  least(len(tokens), p + {m - 1} + {W}))
                   )) AS wtoks
            FROM dpos WHERE {conds}"""
        for conds, m, term in _sql_multi_terms())
    return f"""
        WITH dtoks AS (SELECT ts, {tok} AS tokens FROM {tr}),
        dpos AS (SELECT ts, tokens, unnest(tokens) AS tok,
                        generate_subscripts(tokens, 1) AS p
                 FROM dtoks),
        dwin AS MATERIALIZED (
            SELECT tok AS term, ts,
                   list_distinct(list_concat(
                       list_slice(tokens, greatest(1, p - {W}), p - 1),
                       list_slice(tokens, p + 1,
                                  least(len(tokens), p + {W}))
                   )) AS wtoks
            FROM dpos WHERE tok IN ({gaz}){multi}),
        dbb AS (SELECT (min(epoch_us(ts) // 86400000000)
                        + max(epoch_us(ts) // 86400000000)) // 2
                       AS mid
                FROM dwin),
        dex AS (SELECT term,
                       CASE WHEN epoch_us(ts) // 86400000000 <= dbb.mid
                            THEN 'early' ELSE 'late' END AS half,
                       unnest(wtoks) AS tok
                FROM dwin, dbb),
        dst AS MATERIALIZED (
            SELECT term, half, tok, CAST(count(*) AS BIGINT) AS c
            FROM dex GROUP BY ALL),
        dns AS MATERIALIZED (
            SELECT term, half, CAST(sum(c) AS BIGINT) AS ns
            FROM dst GROUP BY term, half),
        dde AS (SELECT term, tok, c FROM dst WHERE half = 'early'),
        ddl AS (SELECT term, tok, c FROM dst WHERE half = 'late'),
        dg AS (SELECT coalesce(e.term, l.term) AS term,
                      coalesce(e.c, 0) AS ca, coalesce(l.c, 0) AS cb
               FROM dde e FULL JOIN ddl l
                    ON l.term = e.term AND l.tok = e.tok),
        dj AS (SELECT g.term, g.ca, g.cb, ne.ns AS na, nl.ns AS nb
               FROM dg g
               JOIN dns ne ON ne.term = g.term AND ne.half = 'early'
               JOIN dns nl ON nl.term = g.term AND nl.half = 'late'),
        dterms AS (SELECT term, na, nb,
                       CASE WHEN ca > 0 THEN CAST(floor(ca * ln(
                           (2 * CAST(ca AS DOUBLE) * nb)
                           / (CAST(ca AS DOUBLE) * nb
                              + CAST(cb AS DOUBLE) * na))
                           * 1e6 + 0.5) AS BIGINT) ELSE 0 END AS ta,
                       CASE WHEN cb > 0 THEN CAST(floor(cb * ln(
                           (2 * CAST(cb AS DOUBLE) * na)
                           / (CAST(ca AS DOUBLE) * nb
                              + CAST(cb AS DOUBLE) * na))
                           * 1e6 + 0.5) AS BIGINT) ELSE 0 END AS tb
                   FROM dj),
        dagg AS (SELECT term, na, nb,
                        CAST(sum(ta) AS BIGINT) AS sa,
                        CAST(sum(tb) AS BIGINT) AS sb
                 FROM dterms GROUP BY term, na, nb)
        SELECT term, na AS n_early, nb AS n_late,
               CAST(sa // (2 * na) + sb // (2 * nb) AS BIGINT)
                   AS js_micro
        FROM dagg
    """


def _sql_cooc_kcore(tr: str, tok: str, gaz: str, k: int = 3,
                    rounds: int = 8) -> str:
    """DuckDB mirror of stages/pagerank.kcore — the fixed peel rounds
    unrolled as CTE triples (d{i}: undirected degrees, a{i}: nodes
    still >= k, und{i}: the induced surviving edge stream), the 4th
    bounded-iteration mirror after k-means / CW / PageRank.  Every
    level is AS MATERIALIZED: each und is referenced three times, so
    inlining would re-expand the whole cooc chain 3^rounds times."""
    from wsid_ray.config import NPMI_MIN
    ctes, prev = "", "und0"
    for i in range(1, rounds + 1):
        ctes += f""",
        d{i} AS MATERIALIZED (
            SELECT term, u, CAST(count(*) AS BIGINT) AS d
            FROM {prev} GROUP BY term, u),
        a{i} AS MATERIALIZED (SELECT term, u FROM d{i} WHERE d >= {k}),
        und{i} AS MATERIALIZED (
            SELECT e.term, e.u, e.x FROM {prev} e
            JOIN a{i} s ON s.term = e.term AND s.u = e.u
            JOIN a{i} t ON t.term = e.term AND t.u = e.x)"""
        prev = f"und{i}"
    return f"""
        WITH {_sql_cooc_chain(tr, tok, gaz)},
        kc_ed AS (SELECT term, w, v FROM weighted
                  WHERE npmi > {NPMI_MIN}),
        und0 AS MATERIALIZED (
            SELECT term, w AS u, v AS x FROM kc_ed
            UNION ALL SELECT term, v, w FROM kc_ed){ctes},
        dfin AS (SELECT term, u, CAST(count(*) AS BIGINT) AS d
                 FROM {prev} GROUP BY term, u)
        SELECT term, u AS node, d AS deg FROM dfin WHERE d >= {k}
    """


def _sql_cooc_bfs(tr: str, tok: str, gaz: str, rounds: int = 4) -> str:
    """DuckDB mirror of stages/pagerank.bfs_hops — seed = per-term hub
    (deg desc, name asc), then the fixed BFS rounds unrolled as
    frontier/label CTE pairs (f{i}: newly reached nodes, l{i}: all
    labelled so far).  Frontier BFS yields the exact hop distance, so
    the only determinism pin needed is the seed tie-break.  6th
    bounded-iteration mirror."""
    from wsid_ray.config import NPMI_MIN
    ctes, prevf, prevl = "", "l0", "l0"
    for i in range(1, rounds + 1):
        ctes += f""",
        f{i} AS MATERIALIZED (
            SELECT DISTINCT e.term, e.x AS node FROM und0 e
            JOIN {prevf} s ON s.term = e.term AND s.node = e.u
            WHERE NOT EXISTS (SELECT 1 FROM {prevl} v
                              WHERE v.term = e.term AND v.node = e.x)),
        l{i} AS MATERIALIZED (
            SELECT * FROM {prevl}
            UNION ALL
            SELECT term, node, CAST({i} AS BIGINT) FROM f{i})"""
        prevf, prevl = f"f{i}", f"l{i}"
    return f"""
        WITH {_sql_cooc_chain(tr, tok, gaz)},
        bf_ed AS (SELECT term, w, v FROM weighted
                  WHERE npmi > {NPMI_MIN}),
        und0 AS MATERIALIZED (
            SELECT term, w AS u, v AS x FROM bf_ed
            UNION ALL SELECT term, v, w FROM bf_ed),
        dg AS MATERIALIZED (
            SELECT term, u, CAST(count(*) AS BIGINT) AS d
            FROM und0 GROUP BY term, u),
        l0 AS MATERIALIZED (
            SELECT term, u AS node, CAST(0 AS BIGINT) AS dist
            FROM (SELECT term, u, row_number() OVER (
                      PARTITION BY term ORDER BY d DESC, u) AS rk
                  FROM dg) WHERE rk = 1){ctes}
        SELECT term, node, dist FROM {prevl}
    """


def _sql_cooc_hub_paths(tr: str, tok: str, gaz: str,
                        rounds: int = 4) -> str:
    """DuckDB mirror of stages/pagerank.hub_cheapest_paths — weighted
    Bellman–Ford from the bfs_hops seed, fixed synchronous rounds
    unrolled as candidate/min CTE pairs over integer NPMI costs
    (1e6 − wq, the weighted-PageRank quantisation).  7th
    bounded-iteration mirror; the min fold needs no tie-break pins."""
    from wsid_ray.config import NPMI_MIN
    ctes, prev = "", "wd0"
    for i in range(1, rounds + 1):
        ctes += f""",
        wc{i} AS (SELECT e.term, e.x AS node,
                         MIN(d.dist + e.cost) AS dist
                  FROM wp_un e
                  JOIN {prev} d ON d.term = e.term AND d.node = e.u
                  GROUP BY e.term, e.x),
        wd{i} AS MATERIALIZED (
            SELECT term, node, CAST(MIN(dist) AS BIGINT) AS dist
            FROM (SELECT * FROM {prev}
                  UNION ALL SELECT * FROM wc{i})
            GROUP BY term, node)"""
        prev = f"wd{i}"
    return f"""
        WITH {_sql_cooc_chain(tr, tok, gaz)},
        wp_ed AS (SELECT term, w, v,
                         1000000 - CAST(floor(npmi * 1e6 + 0.5)
                                        AS BIGINT) AS cost
                  FROM weighted WHERE npmi > {NPMI_MIN}),
        wp_un AS MATERIALIZED (
            SELECT term, w AS u, v AS x, cost FROM wp_ed
            UNION ALL SELECT term, v, w, cost FROM wp_ed),
        wp_dg AS (SELECT term, u, CAST(count(*) AS BIGINT) AS d
                  FROM wp_un GROUP BY term, u),
        wd0 AS (SELECT term, u AS node, CAST(0 AS BIGINT) AS dist
                FROM (SELECT term, u, row_number() OVER (
                          PARTITION BY term ORDER BY d DESC, u) AS rk
                      FROM wp_dg) WHERE rk = 1){ctes}
        SELECT term, node, dist FROM {prev}
    """


def _sql_cooc_stress(tr: str, tok: str, gaz: str) -> str:
    """DuckDB mirror of stages/pagerank.stress_centrality — the ≤3-hop
    shortest-pairs table (dist, σ) built by the unrolled BFS-count
    recurrence (σ_d(s,t) = Σ_mid σ_{d−1}(s,mid) over mids adjacent to
    t, masked to first reach), then stress(v) = Σ σ_sv·σ_vt over leg
    pairs whose dist sum hits the pair's shortest dist — enforced by
    joining the pairs table (one row per pair, at its shortest dist)
    on c.dist = a.dist + b.dist.  All-integer; a.s < b.t
    canonicalises each unordered (s,t) once."""
    from wsid_ray.config import NPMI_MIN
    return f"""
        WITH {_sql_cooc_chain(tr, tok, gaz)},
        st_ed AS (SELECT term, w, v FROM weighted
                  WHERE npmi > {NPMI_MIN}),
        st_un AS MATERIALIZED (
            SELECT term, w AS s, v AS t FROM st_ed
            UNION ALL SELECT term, v, w FROM st_ed),
        sp1 AS MATERIALIZED (
            SELECT term, s, t, CAST(1 AS BIGINT) AS dist,
                   CAST(1 AS HUGEINT) AS sig FROM st_un),
        sp2 AS MATERIALIZED (
            SELECT p.term, p.s, e.t, CAST(2 AS BIGINT) AS dist,
                   SUM(p.sig) AS sig
            FROM sp1 p JOIN st_un e ON e.term = p.term AND e.s = p.t
            WHERE e.t <> p.s AND NOT EXISTS (
                SELECT 1 FROM sp1 q
                WHERE q.term = p.term AND q.s = p.s AND q.t = e.t)
            GROUP BY p.term, p.s, e.t),
        sp3 AS MATERIALIZED (
            SELECT p.term, p.s, e.t, CAST(3 AS BIGINT) AS dist,
                   SUM(p.sig) AS sig
            FROM sp2 p JOIN st_un e ON e.term = p.term AND e.s = p.t
            WHERE e.t <> p.s
              AND NOT EXISTS (SELECT 1 FROM sp1 q
                  WHERE q.term = p.term AND q.s = p.s AND q.t = e.t)
              AND NOT EXISTS (SELECT 1 FROM sp2 q
                  WHERE q.term = p.term AND q.s = p.s AND q.t = e.t)
            GROUP BY p.term, p.s, e.t),
        spa AS MATERIALIZED (
            SELECT * FROM sp1 UNION ALL SELECT * FROM sp2
            UNION ALL SELECT * FROM sp3)
        SELECT a.term, a.t AS node,
               CAST(SUM(a.sig * b.sig) AS BIGINT) AS stress
        FROM spa a
        JOIN spa b ON b.term = a.term AND b.s = a.t
        JOIN spa c ON c.term = a.term AND c.s = a.s AND c.t = b.t
                  AND c.dist = a.dist + b.dist
        WHERE a.s < b.t AND a.t <> a.s AND a.t <> b.t
        GROUP BY a.term, a.t
    """


def _sql_embedding_pca(rounds: int = 8) -> str:
    """DuckDB mirror of stages/pca.pca_projection — micro-unit
    quantisation, the exact HUGEINT Gram matrix, and the FIXED power
    rounds unrolled as CTE triples (u{i}: G @ v, m{i}: max|u| guard,
    v{i}: rescale by truncating division — DuckDB's native ``//``
    semantics, matched by the engine's tdiv).  5th bounded-iteration
    mirror after k-means / CW / PageRank / k-core."""
    ctes, prev = "", "v0"
    for i in range(1, rounds + 1):
        ctes += f""",
        u{i} AS MATERIALIZED (
            SELECT g.i, SUM(g.g * v.val) AS u
            FROM gram g JOIN {prev} v ON v.i = g.j GROUP BY g.i),
        m{i} AS (SELECT GREATEST(MAX(ABS(u)), 1) AS m FROM u{i}),
        v{i} AS MATERIALIZED (
            SELECT i, (u * 1000000) // m AS val FROM u{i}, m{i})"""
        prev = f"v{i}"
    return f"""
        WITH qe AS MATERIALIZED (
            SELECT vec_id, i,
                   CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT) AS q
            FROM (SELECT vec_id, unnest(embedding) AS x,
                         generate_subscripts(embedding, 1) AS i
                  FROM embeddings)),
        gram AS MATERIALIZED (
            SELECT a.i AS i, b.i AS j,
                   SUM(CAST(a.q AS HUGEINT) * b.q) AS g
            FROM qe a JOIN qe b ON b.vec_id = a.vec_id
            GROUP BY a.i, b.i),
        v0 AS (SELECT DISTINCT i, CAST(1000000 AS HUGEINT) AS val
               FROM gram){ctes}
        SELECT qe.vec_id,
               CAST(SUM(CAST(qe.q AS HUGEINT) * v.val) // 1000000
                    AS BIGINT) AS proj
        FROM qe JOIN {prev} v USING (i) GROUP BY qe.vec_id
    """


# dequantized-vector CTE chain (int8 scalar quantization round trip,
# operation order shared verbatim with stages/knn.dequantize_batch) —
# the base of knn_quantized_topk / knn_quantized_recall
_SQL_DQ_VECS = """
    e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings),
    m AS (SELECT vec_id, min(x) AS vmin, max(x) AS vmax
          FROM e GROUP BY vec_id),
    dqv AS (SELECT e.vec_id, e.i,
                   m.vmin + floor((e.x - m.vmin) / (m.vmax - m.vmin)
                                  * 255 + 0.5)
                            / 255 * (m.vmax - m.vmin) AS v
            FROM e JOIN m USING (vec_id) WHERE m.vmax > m.vmin),
    vecs AS (SELECT vec_id, array_agg(v ORDER BY i) AS embedding
             FROM dqv GROUP BY vec_id)
"""

_SQL_KNN_QUANT_TOPK = f"""
    WITH {_SQL_DQ_VECS}
    SELECT query_id, vec_id, score FROM (
        SELECT q.vec_id AS query_id, e2.vec_id AS vec_id,
               round(list_cosine_similarity(e2.embedding, q.embedding),
                     6) AS score,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(e2.embedding,
                                                   q.embedding) DESC,
                       e2.vec_id) AS rk
        FROM vecs e2
        CROSS JOIN (SELECT vec_id, embedding FROM vecs
                    WHERE vec_id < 5) q
        WHERE e2.vec_id <> q.vec_id)
    WHERE rk <= 10
"""

_SQL_KNN_EXACT = """
    SELECT query_id, vec_id, score FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
               round(list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]),
                   CAST(q.embedding AS DOUBLE[])), 6) AS score,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(q.embedding AS DOUBLE[])) DESC,
                       e.vec_id) AS rk
        FROM embeddings e
        CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                    WHERE vec_id < 5) q
        WHERE e.vec_id <> q.vec_id)
    WHERE rk <= 10
"""


_SQL_KNN_SELF = """
    SELECT query_id, vec_id, score FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
               round(list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]),
                   CAST(q.embedding AS DOUBLE[])), 6) AS score,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(q.embedding AS DOUBLE[])) DESC,
                       e.vec_id) AS rk
        FROM embeddings e
        CROSS JOIN embeddings q
        WHERE e.vec_id <> q.vec_id)
    WHERE rk <= 5
"""


def _sql_bpe_merges(rounds: int = 6, passes: int = 12,
                    subword_counts: bool = False,
                    fertility: bool = False) -> str:
    """DuckDB mirror of stages/bpe.train_bpe — the BPE merge loop
    unrolled to ``rounds`` CTE triples (p{r}: freq-weighted
    adjacent-pair counts over word TYPES, b{r}: the (cnt DESC, lft,
    rgt) argmax, s{r}: the merge applied as ``passes`` nested
    leftmost-nonoverlapping replaces on the delimiter-framed symbol
    string — DuckDB replace() and Python str.replace share those
    semantics, and 12 passes reach fixpoint for the ≤25-symbol words
    the engine's contract asserts).  s{r}/b{r} MATERIALIZED so the
    final UNION doesn't re-derive the whole chain per round."""
    tok = _sql_token_expr()
    # fertility mode carries the word through the merge chain so the
    # final seq can be joined back to per-(lang, word) frequencies
    keep = ", word" if fertility else ""
    ctes = [f"""w AS MATERIALIZED (
            SELECT tk AS word, CAST(count(*) AS BIGINT) AS freq
            FROM (SELECT unnest({tok}) AS tk FROM documents)
            WHERE length(tk) <= 24 GROUP BY 1)""",
            f"""s0 AS MATERIALIZED (SELECT freq{keep},
                '|' || array_to_string(list_transform(
                    range(1, length(word) + 1), i -> word[i]), '|')
                    || '|</w>|' AS seq
            FROM w)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""p{r} AS (
            SELECT sy[i] AS lft, sy[i + 1] AS rgt,
                   CAST(sum(freq) AS BIGINT) AS n
            FROM (SELECT freq, sy, unnest(range(1, len(sy))) AS i
                  FROM (SELECT freq,
                               string_split(trim(seq, '|'), '|') AS sy
                        FROM s{r - 1}))
            GROUP BY 1, 2)""")
        ctes.append(f"""b{r} AS MATERIALIZED (
            SELECT lft, rgt, n FROM p{r}
            ORDER BY n DESC, lft ASC, rgt ASC LIMIT 1)""")
        expr = "seq"
        for _ in range(passes):
            expr = (f"replace({expr}, '|' || b{r}.lft || '|' || "
                    f"b{r}.rgt || '|', '|' || b{r}.lft || b{r}.rgt "
                    f"|| '|')")
        ctes.append(f"s{r} AS MATERIALIZED (SELECT freq{keep}, "
                    f"{expr} AS seq FROM s{r - 1}, b{r})")
    joined = ",\n        ".join(ctes)
    if fertility:
        # per-lang fertility: (lang, word) freqs joined to each word
        # type's final subword count under the trained merges
        return f"""WITH {joined},
            wl AS (SELECT lang, tk AS word,
                          CAST(count(*) AS BIGINT) AS freq
                   FROM (SELECT lang, unnest({tok}) AS tk
                         FROM documents)
                   WHERE length(tk) <= 24 GROUP BY 1, 2),
            nsub AS (SELECT word,
                            CAST(len(string_split(trim(seq, '|'), '|'))
                                 AS BIGINT) AS n_sub
                     FROM s{rounds})
            SELECT wl.lang,
                   CAST(sum(wl.freq) AS BIGINT) AS n_words,
                   CAST(sum(wl.freq * nsub.n_sub) AS BIGINT)
                       AS n_subwords,
                   CAST(floor(sum(wl.freq * nsub.n_sub)
                        / CAST(sum(wl.freq) AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT) AS fertility_micro
            FROM wl JOIN nsub USING (word)
            GROUP BY wl.lang"""
    if subword_counts:
        # stages/bpe.subword_counts: the corpus re-tokenized with the
        # trained merges — s{rounds} already holds every word type's
        # final symbol string, weighted by freq
        return f"""WITH {joined}
            SELECT sym AS subword, CAST(sum(freq) AS BIGINT) AS n
            FROM (SELECT freq,
                         unnest(string_split(trim(seq, '|'), '|')) AS sym
                  FROM s{rounds})
            GROUP BY 1"""
    sel = "\n            UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS rnd, lft, rgt, "
        f"lft || rgt AS merged, n AS cnt FROM b{r}"
        for r in range(1, rounds + 1))
    return f"WITH {joined}\n        {sel}"


def _sql_markov_stationary(rounds: int = 8) -> str:
    """DuckDB mirror of pipelines/mlstats.event_type_markov_stationary
    — the v ← vP power iteration unrolled to ``rounds`` CTE rounds
    under the integer contract (uniform 1e6//k start, per-term
    truncating v·c//rowtot, exact sums)."""
    ctes = ["""mtr AS (SELECT event_type,
                       lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                           AS prev_type
                FROM events)""",
            """mc AS MATERIALIZED (
                SELECT prev_type AS i, event_type AS j,
                       CAST(count(*) AS BIGINT) AS c
                FROM mtr WHERE prev_type IS NOT NULL GROUP BY 1, 2)""",
            """mrt AS (SELECT i, CAST(SUM(c) AS BIGINT) AS rt
                FROM mc GROUP BY i)""",
            """mst AS (SELECT DISTINCT s FROM
                (SELECT i AS s FROM mc UNION SELECT j FROM mc))""",
            """mv0 AS (SELECT s,
                       CAST(1000000 // (SELECT count(*) FROM mst)
                            AS BIGINT) AS v
                FROM mst)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""mv{r} AS (
                SELECT mc.j AS s,
                       CAST(SUM(p.v * mc.c // mrt.rt) AS BIGINT) AS v
                FROM mv{r - 1} p
                JOIN mc ON mc.i = p.s
                JOIN mrt ON mrt.i = p.s
                GROUP BY mc.j)""")
    joined = ",\n        ".join(ctes)
    return (f"WITH {joined}\n"
            f"        SELECT s AS state, v AS v_micro FROM mv{rounds}")


def _sql_bigram_lm() -> str:
    """DuckDB mirror of stages/lm.bigram_lm_scores (add-one-smoothed
    corpus bigram LM; int64 micro-unit terms so distributed sums are
    order-free) — also the base of doc_importance_sample."""
    return r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS ws
                FROM documents),
            bg AS (
                SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
                FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
                      FROM w WHERE len(ws) >= 2)),
            kg AS (SELECT doc_id, w1, w2, count(*) AS k
                   FROM bg GROUP BY ALL),
            cbg AS (SELECT w1, w2, CAST(sum(k) AS BIGINT) AS c
                    FROM kg GROUP BY ALL),
            ch AS (SELECT w1, CAST(sum(k) AS BIGINT) AS ch
                   FROM kg GROUP BY w1),
            v AS (SELECT count(DISTINCT tok) AS v
                  FROM (SELECT unnest(ws) AS tok FROM w)),
            terms AS (
                SELECT kg.doc_id,
                    CAST(floor(kg.k * ln((cbg.c + 1.0) / (ch.ch + v.v))
                        * 1000000 + 0.5) AS BIGINT) AS sc,
                    kg.k
                FROM kg JOIN cbg USING (w1, w2) JOIN ch USING (w1)
                CROSS JOIN v)
            SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
                floor((CAST(sum(sc) AS DOUBLE) / 1000000.0)
                      / CAST(sum(k) AS DOUBLE) * 1000000 + 0.5)
                    / 1000000.0 AS lm_score
            FROM terms GROUP BY doc_id
    """


def _sql_pack_sequences(cap: int = 256) -> str:
    """DuckDB mirror of stages/packing.pack_sequences: greedy next-fit
    over doc_id order per lang, expressed as a recursive CTE advancing
    all partitions in lockstep on the per-lang row index."""
    return f"""
        WITH RECURSIVE tc AS (
            SELECT doc_id, lang,
                   len(list_filter(regexp_split_to_array(text, '\\s+'),
                                   w -> w <> '')) AS nt
            FROM documents),
        ord AS (
            SELECT doc_id, lang, nt,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY doc_id) AS idx
            FROM tc),
        packs AS (
            SELECT lang, idx, doc_id, nt, nt AS acc, 0 AS pack_id
            FROM ord WHERE idx = 1
            UNION ALL
            SELECT o.lang, o.idx, o.doc_id, o.nt,
                   CASE WHEN p.acc + o.nt <= {cap}
                        THEN p.acc + o.nt ELSE o.nt END,
                   CASE WHEN p.acc + o.nt <= {cap}
                        THEN p.pack_id ELSE p.pack_id + 1 END
            FROM ord o JOIN packs p
              ON o.lang = p.lang AND o.idx = p.idx + 1)
        SELECT doc_id, lang, nt, CAST(pack_id AS BIGINT) AS pack_id
        FROM packs
    """


def _sql_kmeans(k: int = 4, iters: int = 3, dim: int = 64,
                emb_expr: str = "embedding",
                cents_only: bool = False) -> str:
    """DuckDB mirror of stages/kmeans.kmeans_assign — the Lloyd loop
    unrolled to ``iters`` CTE rounds.  Hash-exactness rests on the
    integer contract shared with the engine (kmeans.py module doc):
    micro-unit quantisation, exact int64 distances, min(dist·k + cid)
    assignment keys, integer half-away-from-zero centroid means, empty
    clusters keeping the previous centroid.  ``dim`` matches the
    embeddings fixture (64 at the driver's check scale).  ``emb_expr``
    lets product-quantization mirrors cluster a list_slice of the
    embedding instead (stages/kmeans.pq_codes)."""
    dist = (f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> (q.qe[i] - c.qe[i]) * (q.qe[i] - c.qe[i])))")
    ctes = [f"""q AS MATERIALIZED (
            SELECT vec_id, list_transform({emb_expr}, x ->
                CAST(floor(abs(CAST(x AS DOUBLE)) * 1000000 + 0.5)
                     * sign(CAST(x AS DOUBLE)) AS BIGINT)) AS qe
            FROM embeddings)""",
            f"""c0 AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                        AS BIGINT) AS cid, qe
            FROM (SELECT vec_id, qe FROM q ORDER BY vec_id LIMIT {k}))"""]
    prev = "c0"
    for it in range(1, iters + 1):
        ctes.append(f"""a{it} AS (
            SELECT q.vec_id,
                   CAST(min(({dist}) * {k} + c.cid) % {k} AS BIGINT) AS cl
            FROM q, {prev} c GROUP BY q.vec_id)""")
        ctes.append(f"""s{it} AS (
            SELECT cl AS cid, d, SUM(v) AS sv, count(*) AS n
            FROM (SELECT a.cl, unnest(q.qe) AS v,
                         generate_subscripts(q.qe, 1) AS d
                  FROM q JOIN a{it} a USING (vec_id))
            GROUP BY cl, d)""")
        ctes.append(f"""c{it} AS (
            SELECT p.cid, COALESCE(u.qe, p.qe) AS qe
            FROM {prev} p LEFT JOIN (
                SELECT cid,
                       list(CAST(CASE WHEN sv >= 0
                                 THEN (2 * sv + n) // (2 * n)
                                 ELSE -((-2 * sv + n) // (2 * n)) END
                            AS BIGINT) ORDER BY d) AS qe
                FROM s{it} GROUP BY cid) u USING (cid))""")
        prev = f"c{it}"
    joined = ",\n        ".join(ctes)
    if cents_only:
        # the FINAL codebook (kmeans.kmeans_fit) instead of the
        # assignment — what the PQ-ADC mirror builds its LUT from
        return f"""
        WITH {joined}
        SELECT cid, qe FROM {prev}
    """
    return f"""
        WITH {joined}
        SELECT q.vec_id,
               CAST(min(({dist}) * {k} + c.cid) % {k} AS BIGINT)
                   AS cluster,
               CAST(min(({dist}) * {k} + c.cid) // {k} AS BIGINT) AS dist
        FROM q, {prev} c GROUP BY q.vec_id
    """


def _sql_pq_adc_topk(n_subspaces: int = 4, k: int = 4, iters: int = 3,
                     dim: int = 64, n_queries: int = 5,
                     topk: int = 10) -> str:
    """DuckDB mirror of stages/kmeans.pq_adc_topk — PQ asymmetric
    distance.  Per subspace the FINAL codebook comes from the unrolled
    Lloyd mirror (cents_only); every vector takes the min(dist*k+cid)
    code per subspace (identical key to the kmeans assignment); the
    query-side LUT is the exact int64 squared distance from the query's
    quantised slice to each centroid; ADC = SUM over subspaces of the
    LUT entry at the vector's code; rank (adc ASC, vec_id ASC), self
    excluded, top ``topk``."""
    sub = dim // n_subspaces
    cents_union = " UNION ALL ".join(
        f"SELECT CAST({s} AS BIGINT) AS subspace, cid, qe FROM ("
        + _sql_kmeans(k, iters, sub,
                      f"list_slice(embedding, {s * sub + 1}, "
                      f"{(s + 1) * sub})", cents_only=True)
        + ")" for s in range(n_subspaces))
    quant = ("list_transform(embedding, x -> "
             "CAST(floor(abs(CAST(x AS DOUBLE)) * 1000000 + 0.5) "
             "* sign(CAST(x AS DOUBLE)) AS BIGINT))")
    dist = (f"list_sum(list_transform(range(1, {sub + 1}), "
            f"i -> (v.qe[c.subspace * {sub} + i] - c.qe[i])"
            f" * (v.qe[c.subspace * {sub} + i] - c.qe[i])))")
    return f"""
        WITH qv AS (SELECT vec_id, {quant} AS qe FROM embeddings),
        cents AS ({cents_union}),
        vd AS (SELECT v.vec_id, c.subspace, c.cid, {dist} AS d
               FROM qv v CROSS JOIN cents c),
        codes AS (SELECT vec_id, subspace,
                         CAST(min(d * {k} + cid) % {k} AS BIGINT) AS code
                  FROM vd GROUP BY vec_id, subspace),
        lut AS (SELECT v.vec_id AS query_id, c.subspace, c.cid,
                       {dist} AS d
                FROM (SELECT * FROM qv WHERE vec_id < {n_queries}) v
                CROSS JOIN cents c),
        adc AS (SELECT l.query_id, cd.vec_id,
                       CAST(SUM(l.d) AS BIGINT) AS adc_dist
                FROM codes cd JOIN lut l
                  ON l.subspace = cd.subspace AND l.cid = cd.code
                GROUP BY l.query_id, cd.vec_id)
        SELECT query_id, vec_id, adc_dist FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY adc_dist, vec_id) AS rk
            FROM adc WHERE vec_id <> query_id)
        WHERE rk <= {topk}
    """


def _sql_semdedup(k: int = 4, iters: int = 3, dim: int = 64,
                  tau: float = 0.35) -> str:
    """DuckDB mirror of stages/kmeans.semantic_dedup: the k-means
    assignment subquery (same unrolled Lloyd mirror), then within-cluster
    pairs with integer-exact quantised cosine (int64 dot over float64
    sqrt norms, half-away 6 dp) — drop rule and witness shared with the
    engine."""
    quant = (f"list_transform(embedding, x -> "
             f"CAST(floor(abs(CAST(x AS DOUBLE)) * 1000000 + 0.5) "
             f"* sign(CAST(x AS DOUBLE)) AS BIGINT))")
    rng = f"range(1, {dim + 1})"
    return f"""
        WITH asg AS (SELECT vec_id, cluster
                     FROM ({_sql_kmeans(k, iters, dim)})),
        q2 AS (SELECT vec_id, {quant} AS qe FROM embeddings),
        aq AS (SELECT asg.vec_id, asg.cluster, q2.qe,
                      list_sum(list_transform({rng},
                          i -> q2.qe[i] * q2.qe[i])) AS nq
               FROM asg JOIN q2 USING (vec_id)),
        pairs0 AS (
            SELECT a.vec_id AS va, b.vec_id AS vb,
                   CAST(list_sum(list_transform({rng},
                        i -> a.qe[i] * b.qe[i])) AS DOUBLE)
                   / (sqrt(CAST(a.nq AS DOUBLE))
                      * sqrt(CAST(b.nq AS DOUBLE))) AS cos
            FROM aq a JOIN aq b
              ON a.cluster = b.cluster AND a.vec_id < b.vec_id
            WHERE a.nq > 0 AND b.nq > 0),
        pairs AS (
            SELECT va, vb FROM pairs0
            WHERE floor(abs(cos) * 1e6 + 0.5) * sign(cos) / 1e6 >= {tau})
        SELECT vb AS vec_id, min(va) AS kept_by,
               CAST(count(*) AS BIGINT) AS n_sim
        FROM pairs GROUP BY vb
    """


def _sql_pii_redact() -> str:
    """DuckDB mirror of stages/pii.redact_batch over planted PII
    (stages/pii.plant_pii_batch): patterns, replacement order and the
    planted-span construction are generated from the SAME constants the
    engine uses — both sides run RE2, so match semantics agree exactly."""
    from wsid_ray.stages.pii import REDACTIONS
    red = "ptext"
    for pat, repl in REDACTIONS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    counts = ",\n                   ".join(
        f"CAST(len(regexp_extract_all(ptext, '{pat}')) AS BIGINT) AS {nm}"
        for (pat, _), nm in zip(REDACTIONS,
                                ("n_emails", "n_phones", "n_ips")))
    return f"""
        WITH planted AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or +1 (555) 010-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.' || CAST(doc_id % 7 AS VARCHAR) AS ptext
            FROM documents)
        SELECT doc_id,
                   {counts},
               md5({red}) AS redacted_md5
        FROM planted
    """


def _sql_grams(tok: str, k: int) -> str:
    """Per-doc DISTINCT k-gram hash rows (mirror of dedup.gram_rows):
    30-bit md5 token hashes folded s -> (s*31 + t) % 2^30, docs shorter
    than k tokens emit nothing."""
    from wsid_ray.stages.dedup import _SHINGLE_MOD
    fold = "h[i + 1]"
    for j in range(2, k + 1):
        fold = f"(({fold}) * 31 + h[i + {j}]) % {_SHINGLE_MOD}"
    return f"""
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(len(h) - {k} + 1),
                      i -> {fold})) AS g
        FROM (SELECT doc_id,
                     list_transform({tok}, y ->
                         CAST((md5_number_upper(y) >> 34) AS BIGINT)) AS h
              FROM documents)
        WHERE len(h) >= {k}
    """


def _sql_dedup_spans(tok: str, k: int = 5) -> str:
    """DuckDB mirror of dedup.dedup_spans: grams at every 0-based start
    position, dup = >= 2 distinct docs, covered = union of [p, p+k)
    ranges, kept fingerprint = md5 of the surviving token stream."""
    from wsid_ray.stages.dedup import _SHINGLE_MOD
    fold = "h[p + 1]"
    for j in range(2, k + 1):
        fold = f"(({fold}) * 31 + h[p + {j}]) % {_SHINGLE_MOD}"
    return f"""
        WITH src AS MATERIALIZED (
            SELECT doc_id, {tok} AS toks FROM documents),
        hh AS MATERIALIZED (
            SELECT doc_id, list_transform(toks, y ->
                       CAST((md5_number_upper(y) >> 34) AS BIGINT)) AS h
            FROM src),
        pg AS MATERIALIZED (
            SELECT doc_id, p, {fold} AS g
            FROM (SELECT doc_id, h,
                         unnest(range(len(h) - {k} + 1)) AS p
                  FROM hh WHERE len(h) >= {k})),
        dupg AS (SELECT g FROM pg
                 GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
        cov AS (SELECT DISTINCT doc_id, unnest(range(p, p + {k})) AS t
                FROM pg WHERE g IN (SELECT g FROM dupg)),
        tokpos AS (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS t,
                          unnest(toks) AS tok
                   FROM src),
        kept AS (SELECT tp.doc_id, tp.t, tp.tok FROM tokpos tp
                 ANTI JOIN cov ON cov.doc_id = tp.doc_id
                              AND cov.t = tp.t),
        kc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                      md5(string_agg(tok, ' ' ORDER BY t)) AS kept_fp
               FROM kept GROUP BY doc_id)
        SELECT s.doc_id, CAST(len(s.toks) AS BIGINT) AS n_tokens,
               CAST(len(s.toks) - COALESCE(kc.n_kept, 0) AS BIGINT)
                   AS n_removed,
               COALESCE(kc.kept_fp, md5('')) AS kept_fp
        FROM src s LEFT JOIN kc USING (doc_id)
    """


def _sql_exact_substrings(tok: str, L: int = 5) -> str:
    """DuckDB mirror of dedup.exact_substrings: a length-L token window
    is duplicated iff its exact joined text occurs at >= 2 positions
    corpus-wide (within-doc repeats count); covered = union of [p, p+L);
    output = maximal covered runs (gaps-and-islands) with md5 span
    fingerprints."""
    return f"""
        WITH es_src AS MATERIALIZED (
            SELECT doc_id, {tok} AS toks FROM documents),
        es_win AS MATERIALIZED (
            SELECT doc_id, p,
                   array_to_string(list_slice(toks, p + 1, p + {L}),
                                   ' ') AS w
            FROM (SELECT doc_id, toks,
                         unnest(range(len(toks) - {L} + 1)) AS p
                  FROM es_src WHERE len(toks) >= {L})),
        es_dup AS (SELECT w FROM es_win GROUP BY w HAVING count(*) >= 2),
        es_cov AS (SELECT DISTINCT doc_id, unnest(range(p, p + {L})) AS t
                   FROM es_win WHERE w IN (SELECT w FROM es_dup)),
        es_runs AS (SELECT doc_id, t,
                           t - row_number() OVER (PARTITION BY doc_id
                                                  ORDER BY t) AS grp
                    FROM es_cov),
        es_spans AS (SELECT doc_id, min(t) AS start,
                            CAST(count(*) AS BIGINT) AS len
                     FROM es_runs GROUP BY doc_id, grp)
        SELECT s.doc_id, CAST(s.start AS BIGINT) AS start, s.len,
               md5(array_to_string(list_slice(
                   src.toks, CAST(s.start + 1 AS BIGINT),
                   CAST(s.start + s.len AS BIGINT)), ' ')) AS span_fp
        FROM es_spans s JOIN es_src src USING (doc_id)
    """


def _sql_dup_ngram_stats(tok: str, k: int = 5) -> str:
    """DuckDB mirror of dedup.dup_ngram_stats."""
    return f"""
        WITH grams AS ({_sql_grams(tok, k)}),
        dfreq AS (SELECT g, count(*) AS nd FROM grams GROUP BY g)
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_grams,
               floor(CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6
                   AS dup_frac
        FROM grams JOIN dfreq USING (g)
        GROUP BY doc_id
    """


def _sql_decontaminate(tok: str, k: int = 5, bench_pct: int = 5) -> str:
    """DuckDB mirror of dedup.decontaminate: benchmark = the
    deterministic md5 slice of doc_ids; hits = distinct shared grams."""
    return f"""
        WITH grams AS ({_sql_grams(tok, k)}),
        bench AS (SELECT doc_id FROM documents
                  WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) % 100
                        < {bench_pct}),
        bg AS (SELECT DISTINCT g FROM grams
               WHERE doc_id IN (SELECT doc_id FROM bench))
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM grams
        WHERE doc_id NOT IN (SELECT doc_id FROM bench)
          AND g IN (SELECT g FROM bg)
        GROUP BY doc_id
    """


def _sql_stratified_sample() -> str:
    """DuckDB mirror of stages/textstats.stratified_sample_batch: keep a
    doc iff md5_number_upper(doc_id) % 100 < its language's keep rate."""
    from wsid_ray.stages.textstats import STRATUM_DEFAULT_PCT, STRATUM_PCT
    cases = " ".join(f"WHEN '{lang}' THEN {p}"
                     for lang, p in sorted(STRATUM_PCT.items()))
    return f"""
        SELECT doc_id, lang FROM documents
        WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 <
              CASE lang {cases} ELSE {STRATUM_DEFAULT_PCT} END
    """


def _sql_user_event_pivot(sf: str = "/root/testdata/sf0.01") -> str:
    """Mirror of analytics.user_event_pivot.  The engine discovers the
    pivot column set with a distributed distinct; the mirror derives the
    SAME sorted set directly from the parquet the query reads (ADVICE
    r03: a literal column list silently desyncs if the events fixture
    ever gains or loses a type)."""
    import pyarrow.parquet as _pq
    types = sorted(set(
        _pq.read_table(f"{sf}/events.parquet", columns=["event_type"])
        ["event_type"].to_pylist()))
    filters = ",\n                   ".join(
        f"CAST(count(*) FILTER (event_type = '{tp}') AS BIGINT) AS n_{tp}"
        for tp in types)
    return f"""
            SELECT user_id,
                   {filters}
            FROM events GROUP BY user_id
        """


def oracle_sql() -> dict[str, str]:
    from wsid_ray.artifacts import ANN_K, ANN_QUERY_IDS, ensure
    from wsid_ray.config import (GAZETTEER, NPMI_MIN, PRED_ADDRESSES,
                                 PRED_CO_MENTION, STOPWORDS)
    from wsid_ray.fixtures import generate, transcripts_dir
    from wsid_ray.pipelines.queries import _HLL_ALPHA_M2
    from wsid_ray.stages.dbscan import DBSCAN_EPS_MILLI, DBSCAN_MIN_PTS

    generate("sf0.01")
    art = ensure("sf0.01")
    tr = f"read_parquet('{transcripts_dir('sf0.01')}/*.parquet')"
    tok = _sql_token_expr()
    gaz = ", ".join(f"'{g}'" for g in sorted(GAZETTEER) if " " not in g)
    stop = ", ".join(f"'{s}'" for s in sorted(STOPWORDS))
    linked_sel = _sql_linked_mentions(tr, tok, gaz, art["inventory"],
                                      art["kb"])
    multi_counts = "".join(f"""
            UNION ALL
            SELECT * FROM (
                SELECT '{term}' AS term, count(*) AS n
                FROM pos WHERE {conds}
            ) WHERE n > 0"""
        for conds, _m, term in _sql_multi_terms())
    trend_multi = "".join(f"""
            UNION ALL
            SELECT '{term}' AS term, date_trunc('day', ts) AS day,
                   CAST(count(*) AS BIGINT) AS n
            FROM tpos WHERE {conds} GROUP BY day"""
        for conds, _m, term in _sql_multi_terms())
    assoc_multi = "".join(f"""
                UNION
                SELECT DISTINCT conv_id, '{term}' AS term
                FROM apos WHERE {conds}"""
        for conds, _m, term in _sql_multi_terms())
    branch_multi = "".join(f"""
                UNION ALL
                SELECT '{term}' AS term, 'left' AS side,
                       tokens[p - 1] AS nb
                FROM bpos WHERE {conds} AND p > 1
                UNION ALL
                SELECT '{term}', 'right', tokens[p + {m}]
                FROM bpos WHERE {conds} AND p + {m} <= len(tokens)"""
        for conds, m, term in _sql_multi_terms())
    # shared by user_sessions and session_length_histogram
    sessions_sql = """
            WITH flagged AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
                SELECT user_id, ts, event_id,
                       sum(new_s) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
                FROM flagged
            )
            SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                   count(*) AS n_events, min(ts) AS start_ts,
                   max(ts) AS end_ts
            FROM sess GROUP BY user_id, session_idx
        """
    # shared by doc_tfidf_topk and doc_tfidf_novelty
    tfidf_sql = r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS ws
                FROM documents),
            tfs AS (SELECT doc_id, unnest(ws) AS tok FROM w),
            tf AS (SELECT doc_id, tok, count(*) AS c
                   FROM tfs GROUP BY ALL),
            df AS (SELECT tok, count(DISTINCT doc_id) AS df
                   FROM tfs GROUP BY tok),
            n AS (SELECT count(*) AS n FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.tok AS token,
                       CAST(tf.c AS BIGINT) AS tf,
                       floor(tf.c * (ln((1.0 + n.n) / (1.0 + df.df))
                             + 1.0) * 1000000 + 0.5) / 1000000.0 AS score
                FROM tf JOIN df USING (tok) CROSS JOIN n)
            SELECT doc_id, token, tf, score,
                   CAST(row_number() OVER (PARTITION BY doc_id
                        ORDER BY score DESC, token ASC) AS BIGINT) AS rank
            FROM scored QUALIFY rank <= 5
        """
    # shared by user_daily_dense and user_burstiness
    dense_sql = """
            WITH dc AS (SELECT user_id, date_trunc('day', ts) AS day,
                               CAST(count(*) AS BIGINT) AS n_events
                        FROM events GROUP BY 1, 2),
            db AS (SELECT user_id, min(day) AS d0, max(day) AS d1
                   FROM dc GROUP BY user_id),
            cal AS (SELECT user_id,
                           unnest(generate_series(d0, d1,
                                                  INTERVAL 1 DAY)) AS day
                    FROM db)
            SELECT cal.user_id, cal.day,
                   coalesce(dc.n_events, 0) AS n_events
            FROM cal LEFT JOIN dc ON dc.user_id = cal.user_id
                                 AND dc.day = cal.day
        """
    # shared by term_trend_daily and term_trend_mk
    trend_sql = f"""
            WITH ttoks AS (SELECT ts, {tok} AS tokens FROM {tr}),
            tpos AS (SELECT ts, tokens, unnest(tokens) AS tok,
                            generate_subscripts(tokens, 1) AS p
                     FROM ttoks)
            SELECT tok AS term, date_trunc('day', ts) AS day,
                   CAST(count(*) AS BIGINT) AS n
            FROM tpos WHERE tok IN ({gaz})
            GROUP BY tok, day{trend_multi}
    """
    # exact-rational RBO weights (pipelines/mlstats.ann_rbo):
    # w_d = 9^(d-1) * (2520 // d) * 10^(K-d), common denom 2520*10^K
    rbo_wt = ", ".join(
        f"({d}, {9 ** (d - 1) * (2520 // d) * 10 ** (ANN_K - d)})"
        for d in range(1, ANN_K + 1))
    rbo_den = 2520 * 10 ** ANN_K
    burst_multi = "".join(f"""
            UNION ALL
            SELECT conv_id, '{term}' AS term
            FROM tbp WHERE {conds}"""
        for conds, _m, term in _sql_multi_terms())
    # null-audit SQL generated from the fixture schemas (same shape
    # at every sf); pipelines/queries.q_table_null_audit
    import pyarrow.parquet as _pq
    _audit_parts = []
    for _tbl in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents",
                 "embeddings"):
        _sch = _pq.read_schema(f"/root/testdata/sf0.01/{_tbl}.parquet")
        for _c in sorted(_sch.names):
            _audit_parts.append(
                f"SELECT '{_tbl}' AS tbl, '{_c}' AS col, "
                f"CAST(count(*) AS BIGINT) AS n_rows, "
                f"CAST(count(*) - count({_c}) AS BIGINT) AS n_nulls "
                f"FROM {_tbl}")
    null_audit_sql = "\nUNION ALL\n".join(_audit_parts)
    # shared by status_priority_chisq and status_priority_cramers_v
    chisq_sql = """
            WITH c AS (SELECT o_orderstatus AS r,
                              o_orderpriority AS cl,
                              CAST(count(*) AS HUGEINT) AS o
                       FROM orders GROUP BY ALL),
            rt AS (SELECT r, SUM(o) AS rt FROM c GROUP BY r),
            ct AS (SELECT cl, SUM(o) AS ct FROM c GROUP BY cl),
            nn AS (SELECT SUM(o) AS n FROM c),
            grid AS (SELECT rt.r, ct.cl, rt.rt, ct.ct,
                            coalesce(c.o, 0) AS o
                     FROM rt CROSS JOIN ct
                     LEFT JOIN c ON c.r = rt.r AND c.cl = ct.cl),
            cell AS (SELECT (2 * ((o * nn.n - rt * ct)
                                  * (o * nn.n - rt * ct)) * 1000000
                             + (nn.n * rt * ct))
                            // (2 * (nn.n * rt * ct)) AS term
                     FROM grid, nn)
            SELECT CAST(nn.n AS BIGINT) AS n,
                   CAST(rl.k AS BIGINT) AS r_levels,
                   CAST(cl2.k AS BIGINT) AS c_levels,
                   CAST((rl.k - 1) * (cl2.k - 1) AS BIGINT) AS dof,
                   CAST(s.t AS BIGINT) AS chi2_micro
            FROM nn,
                 (SELECT count(*) AS k FROM rt) rl,
                 (SELECT count(*) AS k FROM ct) cl2,
                 (SELECT SUM(term) AS t FROM cell) s
        """
    # shared by doc_near_dup_drops and source_dedup_impact
    droplist_sql = f"""
            WITH RECURSIVE p AS (
                SELECT doc_a, doc_b
                FROM ({_sql_jaccard_pairs(tok)})
            ),
            nodes AS (
                SELECT DISTINCT doc_id FROM (
                    SELECT doc_a AS doc_id FROM p
                    UNION ALL SELECT doc_b FROM p)
            ),
            e AS (SELECT doc_a AS a, doc_b AS b FROM p
                  UNION ALL SELECT doc_b, doc_a FROM p),
            reach AS (
                SELECT doc_id, doc_id AS r FROM nodes
                UNION
                SELECT e.a AS doc_id, reach.r
                FROM e JOIN reach ON reach.doc_id = e.b
            ),
            canon AS (SELECT doc_id, min(r) AS kept_by
                      FROM reach GROUP BY doc_id)
            SELECT doc_id, kept_by FROM canon WHERE doc_id <> kept_by
        """
    # quality-aware retention: same closure as droplist_sql, keeper is
    # the component's longest doc (n_chars DESC, doc_id ASC)
    keep_longest_sql = f"""
            WITH RECURSIVE p AS (
                SELECT doc_a, doc_b
                FROM ({_sql_jaccard_pairs(tok)})
            ),
            nodes AS (
                SELECT DISTINCT doc_id FROM (
                    SELECT doc_a AS doc_id FROM p
                    UNION ALL SELECT doc_b FROM p)
            ),
            e AS (SELECT doc_a AS a, doc_b AS b FROM p
                  UNION ALL SELECT doc_b, doc_a FROM p),
            reach AS (
                SELECT doc_id, doc_id AS r FROM nodes
                UNION
                SELECT e.a AS doc_id, reach.r
                FROM e JOIN reach ON reach.doc_id = e.b
            ),
            comp AS (SELECT doc_id, min(r) AS comp_id
                     FROM reach GROUP BY doc_id),
            best AS (
                SELECT comp_id, doc_id AS kept_by FROM (
                    SELECT comp.comp_id, comp.doc_id,
                           row_number() OVER (PARTITION BY comp.comp_id
                               ORDER BY d.n_chars DESC, comp.doc_id)
                               AS rn
                    FROM comp JOIN documents d USING (doc_id))
                WHERE rn = 1)
            SELECT c.doc_id, b.kept_by
            FROM comp c JOIN best b USING (comp_id)
            WHERE c.doc_id <> b.kept_by
        """
    # shared by doc_dup_components and dup_component_sizes
    dupcomp_sql = f"""
            WITH RECURSIVE p AS (
                SELECT doc_a, doc_b FROM (
                    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                    FROM ({_sql_doc_simhash(tok)}) a
                    JOIN ({_sql_doc_simhash(tok)}) b
                      ON a.doc_id < b.doc_id
                    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
                )
            ),
            nodes AS (
                SELECT DISTINCT doc_id FROM (
                    SELECT doc_a AS doc_id FROM p
                    UNION ALL SELECT doc_b FROM p)
            ),
            e AS (SELECT doc_a AS a, doc_b AS b FROM p
                  UNION ALL SELECT doc_b, doc_a FROM p),
            reach AS (
                SELECT doc_id, doc_id AS r FROM nodes
                UNION
                SELECT e.a AS doc_id, reach.r
                FROM e JOIN reach ON reach.doc_id = e.b
            )
            SELECT doc_id, min(r) AS canon_id FROM reach GROUP BY doc_id
        """

    # Schleimer 2003 winnowing — shared by doc_winnowing and the
    # MOSS overlap-pair join
    winnow_sql = r"""
            WITH w AS (SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS ws FROM documents),
            g AS (SELECT doc_id, i - 1 AS pos,
                         CAST(md5_number_upper(
                             ws[i] || ' ' || ws[i + 1] || ' '
                             || ws[i + 2]) >> 1 AS BIGINT) AS h,
                         len(ws) - 2 AS n
                  FROM (SELECT doc_id, ws,
                               unnest(range(1, len(ws) - 1)) AS i
                        FROM w WHERE len(ws) >= 3)),
            m AS (SELECT doc_id, pos, h, n,
                   min(h) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN 1 PRECEDING AND 1 PRECEDING) AS p1,
                   min(h) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS p2,
                   min(h) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS p3,
                   min(h) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN 1 FOLLOWING AND 1 FOLLOWING) AS f1,
                   min(h) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS f2,
                   min(h) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS f3
                  FROM g)
            SELECT doc_id, CAST(pos AS BIGINT) AS pos, h AS fp
            FROM m
            WHERE (pos + 3 <= n - 1 AND h < f3)
               OR (pos >= 1 AND pos + 2 <= n - 1
                   AND p1 >= h AND h < f2)
               OR (pos >= 2 AND pos + 1 <= n - 1
                   AND p2 >= h AND h < f1)
               OR (pos >= 3 AND p3 >= h)
        """

    # shared by doc_embed_near_dup and its resumable checkpointed twin —
    # mirror of stages/embed.FakeTextEmbedder (md5 token-bucket
    # histogram) + exact cosine near-dup, end to end
    embed_neardup_sql = f"""
            WITH vecs AS (
                SELECT doc_id,
                       list_transform(range(32), i ->
                           CAST(len(list_filter(toks,
                               y -> md5_number_upper(y) % 32 = i))
                           AS DOUBLE)) AS v
                FROM (SELECT doc_id, {tok} AS toks FROM documents)
            )
            SELECT a.doc_id AS vec_a, b.doc_id AS vec_b,
                   round(list_cosine_similarity(a.v, b.v), 6) AS score
            FROM vecs a JOIN vecs b ON a.doc_id < b.doc_id
            WHERE list_cosine_similarity(a.v, b.v) > 0.99
        """

    return {
        # --- planted-duplicate curation ops (stages/setsim.py): the
        # derived corpus is a pure SQL transform of the driver's own
        # documents table, shared verbatim between engine and mirror ---
        "doc_normalized_dedup": f"""
            WITH {_SQL_PLANTED},
            n AS (SELECT doc_id,
                         trim(regexp_replace(lower(text), '\\s+', ' ',
                                             'g')) AS norm
                  FROM planted),
            g AS (SELECT norm, min(doc_id) AS kept_by,
                         CAST(count(*) AS BIGINT) AS n_group
                  FROM n GROUP BY norm)
            SELECT n.doc_id, g.kept_by, g.n_group
            FROM n JOIN g USING (norm) WHERE g.n_group > 1
        """,
        # all-pairs ground truth for the prefix-filtered set-similarity
        # join — a hash match proves the engine's SSJoin prefix filter
        # generated every qualifying candidate (completeness), not just
        # that its verify math agrees
        "doc_setsim_join": f"""
            WITH {_SQL_PLANTED},
            t AS (SELECT doc_id, {tok} AS toks FROM planted),
            sh AS (SELECT doc_id,
                     CASE WHEN len(toks) < 3
                          THEN [array_to_string(toks, ' ')]
                          ELSE list_distinct(list_transform(
                              range(len(toks) - 2),
                              i -> array_to_string(
                                  list_slice(toks, i + 1, i + 3), ' ')))
                     END AS s
                   FROM t WHERE len(toks) > 0),
            p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                         len(list_intersect(a.s, b.s)) AS i,
                         len(a.s) + len(b.s)
                             - len(list_intersect(a.s, b.s)) AS u
                  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
            SELECT doc_a, doc_b,
                   CAST((i * 1000000) // u AS BIGINT) AS jacc_micro
            FROM p WHERE 2 * i >= u AND i > 0
        """,
        # stages/pagerank.adamic_adar: wedge enumeration on the hub
        # column, deg attach, per-z 1/ln(deg) quantised to micro-units
        # BEFORE the order-free sum; only NON-adjacent u<v pairs emit
        "cooc_adamic_adar": f"""
            WITH {_sql_cooc_chain(tr, tok, gaz)},
            aa_ed AS MATERIALIZED (SELECT term, w, v FROM weighted
                                   WHERE npmi > {NPMI_MIN}),
            aa_und AS MATERIALIZED (
                SELECT term, w AS z, v AS x FROM aa_ed
                UNION ALL SELECT term, v, w FROM aa_ed),
            aa_deg AS (SELECT term, z AS node,
                              CAST(count(*) AS BIGINT) AS deg
                       FROM aa_und GROUP BY term, z),
            aa_wedge AS (SELECT a.term, a.x AS u, b.x AS v, a.z
                         FROM aa_und a
                         JOIN aa_und b ON b.term = a.term
                                      AND b.z = a.z AND a.x < b.x),
            aa_nonadj AS (SELECT w.* FROM aa_wedge w
                          LEFT JOIN aa_ed e ON e.term = w.term
                                           AND e.w = w.u AND e.v = w.v
                          WHERE e.w IS NULL)
            SELECT n.term, n.u, n.v,
                   CAST(count(*) AS BIGINT) AS n_common,
                   CAST(sum(CAST(floor(1e6 / ln(CAST(d.deg AS DOUBLE))
                                       + 0.5) AS BIGINT)) AS BIGINT)
                       AS aa_micro
            FROM aa_nonadj n
            JOIN aa_deg d ON d.term = n.term AND d.node = n.z
            GROUP BY n.term, n.u, n.v
        """,
        # stages/lm.bm25_topk: Okapi BM25 top-5 per doc — exact-int
        # tf/df/dl/N/total, avgdl = one double division, one shared
        # float chain at 6 dp half-up, (score DESC, token ASC) ties
        "doc_bm25_topk": r"""
            WITH w AS (SELECT doc_id,
                              list_filter(regexp_split_to_array(
                                  text, '\s+'), x -> x <> '') AS ws
                       FROM documents),
            tfs AS (SELECT doc_id, unnest(ws) AS token FROM w),
            tf AS (SELECT doc_id, token,
                          CAST(count(*) AS BIGINT) AS tf
                   FROM tfs GROUP BY ALL),
            dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM w),
            dft AS (SELECT token,
                           CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                    FROM tfs GROUP BY token),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                          CAST(coalesce(sum(len(ws)), 0) AS BIGINT)
                              AS tot
                   FROM w),
            scored AS (
                SELECT tf.doc_id, tf.token, tf.tf, dl.dl,
                       floor(ln((CAST(nn.n AS DOUBLE) - dft.df + 0.5)
                                / (dft.df + 0.5) + 1.0)
                             * ((tf.tf * 2.2)
                                / (tf.tf + 1.2 * (0.25 + 0.75
                                   * (CAST(dl.dl AS DOUBLE)
                                      / (CAST(nn.tot AS DOUBLE)
                                         / nn.n)))))
                             * 1e6 + 0.5) / 1e6 AS score
                FROM tf
                JOIN dl ON dl.doc_id = tf.doc_id
                JOIN dft ON dft.token = tf.token, nn)
            SELECT doc_id, token, tf, dl, score,
                   CAST(rk AS BIGINT) AS rank
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY doc_id
                      ORDER BY score DESC, token) AS rk
                  FROM scored)
            WHERE rk <= 5
        """,
        # stages/pagerank.edge_jaccard: per-edge embeddedness (the a<b<c
        # triangle enumeration exploded back onto its three canonical
        # edges) + open-neighbourhood Jaccard in integer micro-units
        "cooc_edge_jaccard": f"""
            WITH {_sql_cooc_chain(tr, tok, gaz)},
            ej_ed AS MATERIALIZED (SELECT term, w, v FROM weighted
                                   WHERE npmi > {NPMI_MIN}),
            tri AS MATERIALIZED (
                SELECT e1.term, e1.w AS a, e1.v AS b, e2.v AS c
                FROM ej_ed e1
                JOIN ej_ed e2 ON e2.term = e1.term AND e2.w = e1.v
                JOIN ej_ed e3 ON e3.term = e1.term AND e3.w = e1.w
                             AND e3.v = e2.v),
            cn AS (SELECT term, x AS w, y AS v,
                          CAST(count(*) AS BIGINT) AS cn
                   FROM (SELECT term, a AS x, b AS y FROM tri
                         UNION ALL SELECT term, b, c FROM tri
                         UNION ALL SELECT term, a, c FROM tri)
                   GROUP BY term, x, y),
            deg AS MATERIALIZED (
                SELECT term, node, CAST(count(*) AS BIGINT) AS d
                FROM (SELECT term, w AS node FROM ej_ed
                      UNION ALL SELECT term, v FROM ej_ed)
                GROUP BY term, node)
            SELECT e.term, e.w, e.v,
                   CAST(COALESCE(cn.cn, 0) AS BIGINT) AS cn,
                   dw.d AS deg_w, dv.d AS deg_v,
                   CAST((COALESCE(cn.cn, 0) * 1000000)
                        // (dw.d + dv.d - COALESCE(cn.cn, 0))
                        AS BIGINT) AS jacc_micro
            FROM ej_ed e
            LEFT JOIN cn ON cn.term = e.term AND cn.w = e.w
                        AND cn.v = e.v
            JOIN deg dw ON dw.term = e.term AND dw.node = e.w
            JOIN deg dv ON dv.term = e.term AND dv.node = e.v
        """,
        # stages/pagerank.kcore: 8 bounded peel rounds, k = 3
        "cooc_kcore": _sql_cooc_kcore(tr, tok, gaz),
        "cooc_bfs_hops": _sql_cooc_bfs(tr, tok, gaz),
        # stages/pagerank.stress_centrality: ≤3-hop Shimbel stress —
        # integer shortest-path counts through each interior node
        "cooc_stress": _sql_cooc_stress(tr, tok, gaz),
        # stages/pagerank.hub_cheapest_paths: bounded-round weighted
        # Bellman–Ford from the hub over integer NPMI costs
        "cooc_hub_paths": _sql_cooc_hub_paths(tr, tok, gaz, rounds=4),
        # pipelines/queries.q_term_profile_cosine: second-order term
        # similarity — cosine over micro-share context profiles
        "term_profile_cosine": f"""
            WITH {_sql_cooc_chain(tr, tok, gaz)},
            tpq AS MATERIALIZED (
                SELECT u.term, u.tok,
                       (CAST(u.n_w AS BIGINT) * 1000000) // t.nn AS wq
                FROM unicnt u JOIN totcnt t ON t.term = u.term),
            tpp AS MATERIALIZED (
                SELECT a.term AS term_a, b.term AS term_b,
                       CAST(SUM(a.wq * b.wq) AS BIGINT) AS dot
                FROM tpq a JOIN tpq b ON b.tok = a.tok
                                      AND a.term <= b.term
                WHERE a.wq > 0 AND b.wq > 0
                GROUP BY 1, 2),
            tpn AS (SELECT term_a AS term, dot FROM tpp
                    WHERE term_a = term_b)
            SELECT p.term_a, p.term_b, p.dot,
                   CAST(floor(CAST(p.dot AS DOUBLE)
                        / sqrt(CAST(na.dot AS DOUBLE)
                               * CAST(nb.dot AS DOUBLE))
                        * 1e6 + 0.5) AS BIGINT) AS cos_micro
            FROM tpp p JOIN tpn na ON na.term = p.term_a
                       JOIN tpn nb ON nb.term = p.term_b
            WHERE p.term_a < p.term_b
        """,
        # stages/pca.pca_projection: integer-contract power-iteration
        # principal direction + per-vector projections, 8 fixed rounds
        "embedding_pca_projection": _sql_embedding_pca(),
        # stages/pca.label_centroids: per-label micro-unit centroid,
        # truncating mean (DuckDB // == engine tdiv)
        "embedding_label_centroids": """
            WITH e AS (SELECT CAST(label AS BIGINT) AS label,
                              CAST(generate_subscripts(embedding, 1)
                                   AS BIGINT) AS i,
                              CAST(floor(CAST(unnest(embedding)
                                              AS DOUBLE) * 1000000 + 0.5)
                                   AS BIGINT) AS q
                       FROM embeddings)
            SELECT label, i, CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(q) // count(*) AS BIGINT) AS mean_micro
            FROM e GROUP BY label, i
        """,
        # analytics.lineitem_winsorized: percentile_disc-style cutoffs
        # as the value at ROW_NUMBER == ceil(q*n) under the shared
        # (cents, id) sort, then clip + sum — all exact integer math
        # relational_ext.monthly_revenue_yoy: monthly cent sums + the
        # same-month-last-year join; truncating // for yoy_micro
        "monthly_revenue_yoy": """
            WITH m AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
                              CAST(month(o_orderdate) AS BIGINT) AS m,
                              CAST(SUM(CAST(floor(o_totalprice * 100
                                   + 0.5) AS BIGINT)) AS BIGINT)
                                  AS cents
                       FROM orders GROUP BY y, m)
            SELECT a.y, a.m, a.cents, b.cents AS prev_cents,
                   CAST((a.cents - b.cents) * 1000000 // b.cents
                        AS BIGINT) AS yoy_micro
            FROM m a LEFT JOIN m b ON b.y = a.y - 1 AND b.m = a.m
        """,
        # relational_ext.status_revenue_share: percent-of-total in
        # exact integer micro-units
        "status_revenue_share": """
            WITH s AS (SELECT o_orderstatus,
                              CAST(SUM(CAST(floor(o_totalprice * 100
                                   + 0.5) AS BIGINT)) AS BIGINT)
                                  AS cents
                       FROM orders GROUP BY o_orderstatus)
            SELECT o_orderstatus, cents,
                   CAST(cents * 1000000
                        // (SELECT SUM(cents) FROM s) AS BIGINT)
                       AS share_micro
            FROM s
        """,
        # textstats.readability_batch: Flesch Reading Ease from exact
        # RE2 counts, one shared double op chain, 6dp half-up
        "doc_readability": r"""
            WITH c AS (SELECT doc_id,
                              CAST(len(list_filter(
                                  regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')) AS BIGINT) AS w,
                              CAST(greatest(len(regexp_extract_all(
                                  text, '[.!?]+')), 1) AS BIGINT) AS s,
                              CAST(len(regexp_extract_all(
                                  lower(text), '[aeiouy]+'))
                                  AS BIGINT) AS sy
                       FROM documents)
            SELECT doc_id, w AS n_words, s AS n_sentences,
                   sy AS n_syllables,
                   floor((206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
                          - 84.6 * (CAST(sy AS DOUBLE) / w))
                         * 1e6 + 0.5) / 1e6 AS fre6
            FROM c WHERE w > 0
        """,
        # analytics.trailing_active_users: 7-day rolling distinct users
        # per event day
        "daily_trailing_active_users": """
            WITH p AS (SELECT DISTINCT
                              CAST(epoch_us(date_trunc('day', ts))
                                   // 86400000000 AS BIGINT) AS day,
                              user_id
                       FROM events),
            d AS (SELECT DISTINCT day FROM p)
            SELECT d.day AS report_day,
                   CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_users
            FROM d JOIN p ON p.day BETWEEN d.day - 6 AND d.day
            GROUP BY d.day
        """,
        # stages/pca.nearest_centroid: exact integer squared-distance
        # assignment to the per-label centroids, smallest-label ties
        "embedding_nearest_centroid": """
            WITH e AS (SELECT vec_id, CAST(label AS BIGINT)
                                  AS true_label,
                              CAST(generate_subscripts(embedding, 1)
                                   AS BIGINT) AS i,
                              CAST(floor(CAST(unnest(embedding)
                                              AS DOUBLE) * 1000000 + 0.5)
                                   AS BIGINT) AS q
                       FROM embeddings),
            cent AS (SELECT true_label AS clabel, i,
                            CAST(SUM(q) // count(*) AS BIGINT) AS m
                     FROM e GROUP BY true_label, i),
            dist AS (SELECT e.vec_id, MIN(e.true_label) AS true_label,
                            cent.clabel,
                            SUM((e.q - cent.m) * (e.q - cent.m)) AS d2
                     FROM e JOIN cent ON cent.i = e.i
                     GROUP BY e.vec_id, cent.clabel)
            SELECT vec_id, true_label, clabel AS assigned_label,
                   CAST(d2 AS BIGINT) AS dist2,
                   CAST(CASE WHEN clabel = true_label THEN 1 ELSE 0 END
                        AS BIGINT) AS correct
            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY d2, clabel) AS rn FROM dist)
            WHERE rn = 1
        """,
        # stages/chunking.doc_chunks: RAG overlapping token windows
        # (whitespace tokens, stride-48 starts, window-64 slices)
        "doc_chunks": r"""
            WITH w AS (SELECT doc_id,
                              list_filter(regexp_split_to_array(
                                  text, '\s+'), x -> x <> '') AS ws
                       FROM documents),
            st AS (SELECT doc_id, ws,
                          unnest(range(0, len(ws), 48)) AS start
                   FROM w WHERE len(ws) > 0),
            ch AS (SELECT doc_id, start,
                          list_slice(ws, start + 1,
                                     least(start + 64, len(ws))) AS c
                   FROM st)
            SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_idx,
                   CAST(start AS BIGINT) AS start,
                   CAST(len(c) AS BIGINT) AS n_chunk_tokens,
                   md5(array_to_string(c, ' ')) AS chunk_fp
            FROM ch
        """,
        # relational_ext.orders_cdc_merge: last-wins upsert — base
        # version 1, derived version-2 updates/inserts, max version
        # survives per key
        "orders_cdc_merge": """
            WITH base AS (
                SELECT o_orderkey, 1 AS version,
                       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                           AS cents
                FROM orders),
            chg AS (
                SELECT o_orderkey, 2 AS version, cents + 500 AS cents
                FROM base WHERE o_orderkey % 10 = 0
                UNION ALL
                SELECT o_orderkey + 100000000, 2, cents
                FROM base WHERE o_orderkey % 97 = 0),
            u AS (SELECT * FROM base UNION ALL SELECT * FROM chg)
            SELECT o_orderkey, CAST(version AS BIGINT) AS version,
                   cents
            FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
                          ORDER BY version DESC) AS rn FROM u)
            WHERE rn = 1
        """,
        # pipelines/mlstats.source_token_kl: KL(source ‖ corpus) with
        # per-term micro-nat quantisation before the order-free sum;
        # the ln argument is one float division of exact int products
        "source_token_kl": r"""
            WITH w AS (SELECT source,
                              list_filter(regexp_split_to_array(
                                  text, '\s+'), x -> x <> '') AS ws
                       FROM documents),
            tfk AS (SELECT source, unnest(ws) AS token FROM w),
            st AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
                   FROM tfk GROUP BY ALL),
            ctk AS (SELECT token, CAST(sum(c) AS BIGINT) AS ct
                    FROM st GROUP BY token),
            nss AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns
                    FROM st GROUP BY source),
            nt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM st),
            terms AS (SELECT st.source,
                             CAST(floor(st.c * ln(
                                 (CAST(st.c AS DOUBLE) * nt.n)
                                 / (CAST(nss.ns AS DOUBLE) * ctk.ct))
                                 * 1e6 + 0.5) AS BIGINT) AS t
                      FROM st
                      JOIN ctk USING (token)
                      JOIN nss USING (source), nt),
            agg AS (SELECT source, CAST(sum(t) AS BIGINT) AS k
                    FROM terms GROUP BY source)
            SELECT s.source, s.ns AS n_tokens,
                   CAST(coalesce(a.k, 0) AS BIGINT) AS kl_sum_micro,
                   CAST(coalesce(a.k, 0) // s.ns AS BIGINT)
                       AS kl_mean_micro
            FROM nss s LEFT JOIN agg a USING (source)
        """,
        # pipelines/mlstats.source_js_divergence: symmetric JS drift
        # matrix over source unigram profiles — KL-family micro-nat
        # per-term quantisation, truncating // finish (DuckDB semantics)
        "source_js_divergence": r"""
            WITH w AS (SELECT source,
                              list_filter(regexp_split_to_array(
                                  text, '\s+'), x -> x <> '') AS ws
                       FROM documents),
            tfj AS (SELECT source, unnest(ws) AS token FROM w),
            st AS MATERIALIZED (
                SELECT source, token, CAST(count(*) AS BIGINT) AS c
                FROM tfj GROUP BY ALL),
            nss AS MATERIALIZED (
                SELECT source, CAST(sum(c) AS BIGINT) AS ns
                FROM st GROUP BY source),
            prs AS (SELECT a.source AS sa, a.ns AS na,
                           b.source AS sb, b.ns AS nb
                    FROM nss a JOIN nss b ON a.source < b.source),
            tks AS MATERIALIZED (SELECT DISTINCT token FROM st),
            grid AS (SELECT p.sa, p.sb, p.na, p.nb, t.token,
                            coalesce(xa.c, 0) AS ca,
                            coalesce(xb.c, 0) AS cb
                     FROM prs p CROSS JOIN tks t
                     LEFT JOIN st xa ON xa.source = p.sa
                                    AND xa.token = t.token
                     LEFT JOIN st xb ON xb.source = p.sb
                                    AND xb.token = t.token
                     WHERE coalesce(xa.c, 0) > 0
                        OR coalesce(xb.c, 0) > 0),
            terms AS (SELECT sa, sb,
                          CASE WHEN ca > 0 THEN CAST(floor(
                              ca * ln((2 * CAST(ca AS DOUBLE) * nb)
                                  / (CAST(ca AS DOUBLE) * nb
                                     + CAST(cb AS DOUBLE) * na))
                              * 1e6 + 0.5) AS BIGINT) ELSE 0 END AS ta,
                          CASE WHEN cb > 0 THEN CAST(floor(
                              cb * ln((2 * CAST(cb AS DOUBLE) * na)
                                  / (CAST(ca AS DOUBLE) * nb
                                     + CAST(cb AS DOUBLE) * na))
                              * 1e6 + 0.5) AS BIGINT) ELSE 0 END AS tb
                      FROM grid),
            agg AS (SELECT sa, sb, CAST(sum(ta) AS BIGINT) AS sa_sum,
                           CAST(sum(tb) AS BIGINT) AS sb_sum
                    FROM terms GROUP BY sa, sb)
            SELECT agg.sa AS src_a, agg.sb AS src_b,
                   agg.sa_sum AS sum_a_micro,
                   agg.sb_sum AS sum_b_micro,
                   CAST(agg.sa_sum // (2 * na.ns)
                        + agg.sb_sum // (2 * nb.ns) AS BIGINT)
                       AS js_micro
            FROM agg
            JOIN nss na ON na.source = agg.sa
            JOIN nss nb ON nb.source = agg.sb
        """,
        # pipelines/mlstats.doc_length_lognormal: log-normal MoM fit of
        # doc lengths — micro-nat ln quantisation, one sqrt float chain
        "doc_length_lognormal": """
            WITH lnl AS (SELECT CAST(floor(ln(CAST(n_chars AS DOUBLE))
                                * 1e6 + 0.5) AS BIGINT) AS lm
                         FROM documents),
            lmm AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                           SUM(CAST(lm AS HUGEINT)) AS s,
                           SUM(CAST(lm AS HUGEINT) * lm) AS s2
                    FROM lnl)
            SELECT CAST(n AS BIGINT) AS n_docs,
                   CAST(s // n AS BIGINT) AS mu_micro,
                   CAST(floor(sqrt(CAST(n * s2 - s * s AS DOUBLE)) / n
                        + 0.5) AS BIGINT) AS sigma_micro
            FROM lmm
        """,
        # pipelines/mlstats.click_purchase_xcorr: lagged Pearson r of
        # the dense daily click/purchase series — exact int moments per
        # lag, one shared float chain, NULL on zero variance
        "click_purchase_xcorr": """
            WITH xce AS (SELECT date_trunc('day', ts) AS day,
                                event_type FROM events
                         WHERE event_type IN ('click', 'purchase')),
            xdc AS (SELECT day, event_type,
                           CAST(count(*) AS BIGINT) AS n
                    FROM xce GROUP BY 1, 2),
            xbb AS (SELECT min(day) AS d0, max(day) AS d1 FROM xdc),
            xcal AS (SELECT unnest(generate_series(d0, d1,
                                INTERVAL 1 DAY)) AS day
                     FROM xbb),
            xs AS MATERIALIZED (
                SELECT xcal.day,
                       coalesce((SELECT n FROM xdc
                                 WHERE xdc.day = xcal.day
                                   AND event_type = 'click'), 0) AS a,
                       coalesce((SELECT n FROM xdc
                                 WHERE xdc.day = xcal.day
                                   AND event_type = 'purchase'), 0)
                           AS b
                FROM xcal),
            xlg AS (SELECT unnest(range(-3, 4)) AS lag),
            xpp AS (SELECT l.lag, x.a AS x, y.b AS y
                    FROM xlg l
                    CROSS JOIN xs x
                    JOIN xs y ON epoch_us(y.day) = epoch_us(x.day)
                                 + l.lag * 86400000000),
            xm AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(x) AS BIGINT) AS sx,
                          CAST(sum(y) AS BIGINT) AS sy,
                          CAST(sum(x * x) AS BIGINT) AS sxx,
                          CAST(sum(y * y) AS BIGINT) AS syy,
                          CAST(sum(x * y) AS BIGINT) AS sxy
                   FROM xpp GROUP BY lag)
            SELECT CAST(lag AS BIGINT) AS lag, n AS n_overlap,
                   CASE WHEN n < 2 OR n * sxx - sx * sx = 0
                             OR n * syy - sy * sy = 0 THEN NULL
                        ELSE CAST(floor(
                            CAST(n * sxy - sx * sy AS DOUBLE)
                            / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                   * CAST(n * syy - sy * sy
                                          AS DOUBLE))
                            * 1e6 + 0.5) AS BIGINT)
                   END AS r_micro
            FROM xm
        """,
        # pipelines/mlstats.daily_revenue_theilsen: robust Theil-Sen
        # slope — median of pairwise CAST(int)/int slopes, micro
        "daily_revenue_theilsen": """
            WITH tsd AS (SELECT date_trunc('day', o_orderdate) AS day,
                                CAST(sum(CAST(floor(o_totalprice * 100
                                     + 0.5) AS BIGINT)) AS BIGINT)
                                    AS rev
                         FROM orders GROUP BY 1),
            tsx AS MATERIALIZED (
                SELECT epoch_us(day) // 86400000000 AS d, rev
                FROM tsd),
            tsl AS (SELECT CAST(b.rev - a.rev AS DOUBLE) / (b.d - a.d)
                           AS s
                    FROM tsx a JOIN tsx b ON b.d > a.d)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM tsx)
                       AS n_days,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(floor(median(s) * 1e6 + 0.5) AS BIGINT)
                       AS slope_micro
            FROM tsl
        """,
        # pipelines/mlstats.source_lang_mi: MI contingency cells with
        # per-cell micro-nat quantisation (exact int products inside
        # the one float division, the KL convention)
        "source_lang_mi": """
            WITH mst AS (SELECT source, lang,
                                CAST(count(*) AS BIGINT) AS c
                         FROM documents GROUP BY ALL),
            mcs AS (SELECT source, CAST(sum(c) AS BIGINT) AS cs
                    FROM mst GROUP BY source),
            mcl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS cl
                    FROM mst GROUP BY lang),
            mnt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM mst)
            SELECT mst.source, mst.lang, mst.c,
                   CAST(floor(mst.c * ln(
                       (CAST(mst.c AS DOUBLE) * mnt.n)
                       / (CAST(mcs.cs AS DOUBLE) * mcl.cl))
                       * 1e6 + 0.5) AS BIGINT) AS mi_term_micro
            FROM mst
            JOIN mcs USING (source)
            JOIN mcl USING (lang), mnt
        """,
        # pipelines/mlstats.segment_target_encoding: smoothed mean
        # encoding, exact HUGEINT finish (m = 100)
        "segment_target_encoding": """
            WITH tej AS (SELECT c.c_mktsegment,
                                CAST(floor(o.o_totalprice * 100 + 0.5)
                                     AS BIGINT) AS cents
                         FROM orders o
                         JOIN customer c ON o.o_custkey = c.c_custkey),
            tes AS (SELECT c_mktsegment,
                           CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(cents) AS BIGINT) AS sum_cents
                    FROM tej GROUP BY c_mktsegment),
            tet AS (SELECT CAST(sum(n) AS HUGEINT) AS nt,
                           CAST(sum(sum_cents) AS HUGEINT) AS total
                    FROM tes)
            SELECT s.c_mktsegment, s.n, s.sum_cents,
                   CAST((CAST(s.sum_cents AS HUGEINT) * tet.nt
                         + 100 * tet.total) * 1000000
                        // (tet.nt * (CAST(s.n AS HUGEINT) + 100))
                        AS BIGINT) AS enc_micro_cents
            FROM tes s, tet
        """,
        # stages/textstats.feature_hash_batch: hashing-trick BoW,
        # bucket = md5_number_upper(token) % 64 (shared hash parity)
        "doc_feature_hash": r"""
            WITH fhw AS (SELECT doc_id,
                                list_filter(regexp_split_to_array(
                                    text, '\s+'), x -> x <> '') AS ws
                         FROM documents),
            fhf AS (SELECT doc_id, unnest(ws) AS tok FROM fhw)
            SELECT doc_id,
                   CAST(md5_number_upper(tok) % 64 AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n
            FROM fhf GROUP BY ALL
        """,
        # pipelines/mlstats.langid_confusion: model pred vs fixture
        # label matrix over the shared langid mirror
        "langid_confusion": f"""
            SELECT d.lang, l.lang_pred, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents d
            JOIN ({_sql_doc_langid_model(art['langid_profile'])}) l USING (doc_id)
            GROUP BY ALL
        """,
        # pipelines/mlstats.langid_eval: per-language P/R/F1 as micro
        # ints with truncating //; labels = union(true, predicted);
        # NULL where a denominator is zero
        "langid_eval": f"""
            WITH lec AS (
                SELECT d.lang, l.lang_pred, count(*) AS n
                FROM documents d
                JOIN ({_sql_doc_langid_model(art['langid_profile'])}) l USING (doc_id)
                GROUP BY ALL),
            lel AS (SELECT lang FROM lec
                    UNION SELECT lang_pred FROM lec),
            lem AS (
                SELECT ll.lang,
                       coalesce(sum(CASE WHEN c.lang = ll.lang
                                          AND c.lang_pred = ll.lang
                                    THEN c.n END), 0) AS tp,
                       coalesce(sum(CASE WHEN c.lang <> ll.lang
                                          AND c.lang_pred = ll.lang
                                    THEN c.n END), 0) AS fp,
                       coalesce(sum(CASE WHEN c.lang = ll.lang
                                          AND c.lang_pred <> ll.lang
                                    THEN c.n END), 0) AS fn
                FROM lel ll LEFT JOIN lec c
                  ON c.lang = ll.lang OR c.lang_pred = ll.lang
                GROUP BY ll.lang)
            SELECT lang, CAST(tp + fn AS BIGINT) AS n_true,
                   CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
                   CAST(fn AS BIGINT) AS fn,
                   CAST(CASE WHEN tp + fp > 0
                        THEN tp * 1000000 // (tp + fp) END AS BIGINT)
                       AS precision_micro,
                   CAST(CASE WHEN tp + fn > 0
                        THEN tp * 1000000 // (tp + fn) END AS BIGINT)
                       AS recall_micro,
                   CAST(CASE WHEN 2 * tp + fp + fn > 0
                        THEN 2 * tp * 1000000 // (2 * tp + fp + fn) END
                        AS BIGINT) AS f1_micro
            FROM lem
        """,
        # pipelines/mlstats.status_theil_index: quantised-ln integer
        # contract; per-row term BIGINT, HUGEINT sum, truncating //
        "status_theil_index": """
            WITH thb AS (SELECT o_orderstatus,
                                CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT) AS cents
                         FROM orders),
            tht AS (SELECT o_orderstatus,
                           CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(cents) AS BIGINT) AS sum_cents
                    FROM thb GROUP BY 1),
            thx AS (SELECT b.o_orderstatus,
                           CAST(floor(ln(CAST(b.cents AS DOUBLE) * t.n
                                         / t.sum_cents) * 1e6 + 0.5)
                                AS BIGINT) * b.cents AS term
                    FROM thb b JOIN tht t USING (o_orderstatus))
            SELECT t.o_orderstatus, t.n, t.sum_cents,
                   CAST(sum(x.term) // t.sum_cents AS BIGINT)
                       AS theil_micro
            FROM thx x JOIN tht t USING (o_orderstatus)
            GROUP BY t.o_orderstatus, t.n, t.sum_cents
        """,
        # pipelines/mlstats.session_type_pmi: PMI of event types sharing
        # a 30-min gap session (same session rule as user_sessions)
        "session_type_pmi": """
            WITH spf AS (
                SELECT user_id, ts, event_id, event_type,
                       CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            sps AS (
                SELECT user_id, event_type,
                       sum(new_s) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) - 1 AS sid
                FROM spf),
            spp AS (SELECT DISTINCT user_id, sid, event_type FROM sps),
            spn AS (SELECT count(*) AS ns FROM
                    (SELECT DISTINCT user_id, sid FROM spp)),
            sp1 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                    FROM spp GROUP BY 1),
            sp2 AS (SELECT a.event_type AS type_a,
                           b.event_type AS type_b,
                           CAST(count(*) AS BIGINT) AS n_both
                    FROM spp a JOIN spp b
                      ON a.user_id = b.user_id AND a.sid = b.sid
                     AND a.event_type < b.event_type
                    GROUP BY 1, 2)
            SELECT p.type_a, p.type_b, p.n_both,
                   sa.n AS n_a, sb.n AS n_b,
                   CAST(spn.ns AS BIGINT) AS n_sessions,
                   CAST(floor(ln(CAST(p.n_both * spn.ns AS DOUBLE)
                                 / CAST(sa.n * sb.n AS DOUBLE))
                              * 1e6 + 0.5) AS BIGINT) AS pmi_micro
            FROM sp2 p
            JOIN sp1 sa ON sa.event_type = p.type_a
            JOIN sp1 sb ON sb.event_type = p.type_b
            CROSS JOIN spn
        """,
        # pipelines/mlstats.priority_price_mwu: Mann–Whitney U with
        # exact average-rank integers (2·avgrank = 2·rank + cnt − 1)
        "priority_price_mwu": """
            WITH mwb AS (
                SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                           AS cents,
                       CASE WHEN o_orderpriority = '1-URGENT'
                            THEN 1 ELSE 0 END AS ga
                FROM orders
                WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
            mwr AS (SELECT cents, ga,
                           rank() OVER (ORDER BY cents) AS rk,
                           count(*) OVER (PARTITION BY cents) AS cnt
                    FROM mwb),
            mwt AS (SELECT CAST(sum(ga) AS BIGINT) AS n_a,
                           CAST(sum(1 - ga) AS BIGINT) AS n_b,
                           sum(CASE WHEN ga = 1
                               THEN 2 * rk + cnt - 1 END) AS s2a
                    FROM mwr)
            SELECT n_a, n_b,
                   CAST(s2a - n_a * (n_a + 1) AS BIGINT) AS u2,
                   CAST((s2a - n_a * (n_a + 1)) * 1000000
                        // (2 * n_a * n_b) AS BIGINT) AS auc_micro
            FROM mwt
        """,
        # pipelines/mlstats.order_value_median_test: Mood's median
        # test — pooled lower median + nano-quantised χ² cell terms
        "order_value_median_test": """
            WITH mmb AS (SELECT o_orderstatus AS st,
                                CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT) AS yc
                         FROM orders),
            mmn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM mmb),
            mmr AS (SELECT yc,
                           row_number() OVER (ORDER BY yc) AS rn
                    FROM mmb),
            mmm AS (SELECT yc AS m FROM mmr, mmn
                    WHERE rn = (n + 1) // 2),
            mmc AS (SELECT st,
                       CAST(count(*) FILTER (yc > m) AS BIGINT) AS a,
                       CAST(count(*) AS BIGINT) AS tot
                    FROM mmb, mmm GROUP BY st),
            mmt AS (SELECT CAST(sum(a) AS BIGINT) AS ca FROM mmc),
            mmx AS (SELECT CAST(sum(
                        (2 * (CAST(c.a AS HUGEINT) * n - c.tot * t.ca)
                             * (CAST(c.a AS HUGEINT) * n - c.tot * t.ca)
                             * 1000000000
                         + CAST(n AS HUGEINT) * c.tot * t.ca)
                        // (2 * CAST(n AS HUGEINT) * c.tot * t.ca)
                        + (2 * (CAST(c.tot - c.a AS HUGEINT) * n
                                - c.tot * (n - t.ca))
                             * (CAST(c.tot - c.a AS HUGEINT) * n
                                - c.tot * (n - t.ca)) * 1000000000
                           + CAST(n AS HUGEINT) * c.tot * (n - t.ca))
                        // (2 * CAST(n AS HUGEINT) * c.tot
                            * (n - t.ca))) AS HUGEINT) AS chi
                    FROM mmc c, mmt t, mmn
                    GROUP BY t.ca, n)
            SELECT n,
                   (SELECT m FROM mmm) AS m_cents,
                   coalesce((SELECT tot FROM mmc WHERE st = 'F'), 0)
                       AS n_f,
                   coalesce((SELECT a FROM mmc WHERE st = 'F'), 0)
                       AS a_f,
                   coalesce((SELECT tot FROM mmc WHERE st = 'O'), 0)
                       AS n_o,
                   coalesce((SELECT a FROM mmc WHERE st = 'O'), 0)
                       AS a_o,
                   coalesce((SELECT tot FROM mmc WHERE st = 'P'), 0)
                       AS n_p,
                   coalesce((SELECT a FROM mmc WHERE st = 'P'), 0)
                       AS a_p,
                   CASE WHEN t.ca > 0 AND t.ca < n
                        THEN CAST((SELECT chi FROM mmx) AS VARCHAR)
                        END AS chi_nano
            FROM mmn, mmt t
        """,
        # pipelines/mlstats.user_churn_logrank: Mantel–Cox log-rank
        # between click-first and other cohorts — nano-quantised
        # integer E/V terms (the KM no-float-accumulation rule)
        "user_churn_logrank": """
            WITH lre AS (SELECT user_id, epoch_us(ts) AS tu,
                                epoch_us(ts) // 86400000000 AS d,
                                event_type
                         FROM events),
            lrm AS (SELECT user_id, min(tu) AS t0,
                           CAST(min(d) AS BIGINT) AS d0,
                           CAST(max(d) AS BIGINT) AS d1
                    FROM lre GROUP BY user_id),
            lrg AS (SELECT m.user_id, m.d0, m.d1,
                           CASE WHEN min(e.event_type) = 'click'
                                THEN 1 ELSE 0 END AS g1
                    FROM lrm m JOIN lre e ON e.user_id = m.user_id
                                          AND e.tu = m.t0
                    GROUP BY m.user_id, m.d0, m.d1),
            lrx AS (SELECT max(d1) AS dmax FROM lrg),
            lrl AS (SELECT g1, d1 - d0 AS t,
                           CASE WHEN lrx.dmax - d1 > 0 THEN 1 ELSE 0
                           END AS e
                    FROM lrg, lrx),
            lra AS (SELECT t,
                       CAST(coalesce(sum(e) FILTER (g1 = 1), 0)
                            AS BIGINT) AS d1,
                       CAST(coalesce(sum(1 - e) FILTER (g1 = 1), 0)
                            AS BIGINT) AS c1,
                       CAST(sum(e) AS BIGINT) AS dt,
                       CAST(sum(1 - e) AS BIGINT) AS ct
                    FROM lrl GROUP BY t),
            lrr AS (SELECT t, d1, dt,
                       CAST((SELECT count(*) FROM lrl WHERE g1 = 1)
                            AS BIGINT)
                       - CAST(coalesce(sum(d1 + c1) OVER w, 0)
                              AS BIGINT) AS n1,
                       CAST((SELECT count(*) FROM lrl) AS BIGINT)
                       - CAST(coalesce(sum(dt + ct) OVER w, 0)
                              AS BIGINT) AS nt
                    FROM lra
                    WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND 1 PRECEDING)),
            lrt AS (SELECT
                CAST(coalesce(sum(d1), 0) AS BIGINT) AS o1,
                CAST(coalesce(sum(
                    (2 * CAST(dt AS HUGEINT) * n1 * 1000000000 + nt)
                    // (2 * CAST(nt AS HUGEINT))), 0) AS HUGEINT)
                    AS e1n,
                CAST(coalesce(sum(CASE WHEN nt > 1 THEN
                    (2 * CAST(dt AS HUGEINT) * n1 * (nt - n1)
                         * (nt - dt) * 1000000000
                     + CAST(nt AS HUGEINT) * nt * (nt - 1))
                    // (2 * CAST(nt AS HUGEINT) * nt * (nt - 1))
                    ELSE 0 END), 0) AS HUGEINT) AS vn
                FROM lrr WHERE dt > 0 AND nt > 0)
            SELECT
                CAST((SELECT count(*) FROM lrl WHERE g1 = 1)
                     AS BIGINT) AS n_click,
                CAST((SELECT count(*) FROM lrl WHERE g1 = 0)
                     AS BIGINT) AS n_other,
                o1,
                CAST(e1n AS VARCHAR) AS e1_nano,
                CAST(vn AS VARCHAR) AS v_nano,
                CAST(CASE WHEN vn > 0 THEN floor(
                    CAST(CAST(o1 AS HUGEINT) * 1000000000 - e1n
                         AS DOUBLE)
                    * CAST(CAST(o1 AS HUGEINT) * 1000000000 - e1n
                           AS DOUBLE)
                    / (CAST(vn AS DOUBLE) * 1e9) * 1e6 + 0.5)
                    END AS BIGINT) AS chi_micro
            FROM lrt
        """,
        # pipelines/mlstats.order_value_kruskal: tie-corrected
        # Kruskal–Wallis H from pooled 2·avgrank integers, one
        # HUGEINT rational quantised to micro
        "order_value_kruskal": """
            WITH kwb AS (
                SELECT o_orderstatus AS st,
                       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                           AS yc
                FROM orders WHERE o_orderstatus IN ('F', 'O', 'P')),
            kwv AS (SELECT yc, CAST(count(*) AS BIGINT) AS ct
                    FROM kwb GROUP BY yc),
            kwu AS (SELECT yc, ct,
                           2 * coalesce(sum(ct) OVER (ORDER BY yc
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) + ct + 1 AS u
                    FROM kwv),
            kwg AS (SELECT st, yc, CAST(count(*) AS BIGINT) AS c
                    FROM kwb GROUP BY 1, 2),
            kwr AS (SELECT st, CAST(sum(c) AS BIGINT) AS ng,
                           CAST(sum(CAST(c AS HUGEINT) * u) AS HUGEINT)
                               AS su
                    FROM kwg JOIN kwu USING (yc) GROUP BY st),
            kwt AS (SELECT CAST(sum(CAST(ct AS HUGEINT) * ct * ct - ct)
                                AS HUGEINT) AS t,
                           CAST(sum(ct) AS BIGINT) AS n
                    FROM kwu),
            kwp AS (SELECT
                coalesce(MAX(CASE WHEN st = 'F' THEN ng END), 0) AS nf,
                coalesce(MAX(CASE WHEN st = 'O' THEN ng END), 0) AS no_,
                coalesce(MAX(CASE WHEN st = 'P' THEN ng END), 0) AS np_,
                coalesce(MAX(CASE WHEN st = 'F' THEN su END), 0) AS sf,
                coalesce(MAX(CASE WHEN st = 'O' THEN su END), 0) AS so,
                coalesce(MAX(CASE WHEN st = 'P' THEN su END), 0) AS sp
                FROM kwr),
            kwh AS (SELECT nf, no_, np_, n, t,
                           sf * sf * (CAST(no_ AS HUGEINT) * np_)
                           + so * so * (CAST(nf AS HUGEINT) * np_)
                           + sp * sp * (CAST(nf AS HUGEINT) * no_) AS s,
                           CAST(nf AS HUGEINT) * no_ * np_ AS p
                    FROM kwp, kwt)
            SELECT nf AS n_f, no_ AS n_o, np_ AS n_p,
                   CAST(CASE WHEN p > 0 AND
                             CAST(n AS HUGEINT) * n * n - n - t > 0
                        THEN floor(
                            CAST(3 * (s - p * n * (n + 1) * (n + 1))
                                 * (n - 1) AS DOUBLE)
                            / CAST(p * (CAST(n AS HUGEINT) * n * n
                                        - n - t) AS DOUBLE)
                            * 1e6 + 0.5)
                        END AS BIGINT) AS h_micro
            FROM kwh
        """,
        # pipelines/mlstats.dup_quality_auc: exact integer AUC via
        # distinct-score counts over the near-dup drop list
        "dup_quality_auc": f"""
            WITH dqd AS ({droplist_sql}),
            dqs AS (SELECT q.doc_id,
                           CAST(floor(alpha_ratio * 1e6 + 0.5) AS BIGINT)
                               AS s
                    FROM ({_sql_doc_quality(stop)}) q),
            dql AS (SELECT dqs.s,
                           CASE WHEN d.doc_id IS NOT NULL
                                THEN 1 ELSE 0 END AS is_dup
                    FROM dqs LEFT JOIN dqd d USING (doc_id)),
            dqc AS (SELECT s, CAST(sum(is_dup) AS BIGINT) AS np,
                           CAST(sum(1 - is_dup) AS BIGINT) AS nn
                    FROM dql GROUP BY s),
            dqr AS (SELECT s, np, nn,
                           coalesce(sum(nn) OVER (ORDER BY s
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cumneg
                    FROM dqc),
            dqt AS (SELECT CAST(sum(np) AS BIGINT) AS n_pos,
                           CAST(sum(nn) AS BIGINT) AS n_neg,
                           sum(np * (2 * cumneg + nn)) AS num2
                    FROM dqr)
            SELECT n_pos, n_neg,
                   CAST(CASE WHEN n_pos > 0 AND n_neg > 0
                        THEN num2 * 1000000 // (2 * n_pos * n_neg)
                        END AS BIGINT) AS auc_micro
            FROM dqt
        """,
        # pipelines/mlstats.lang_source_hhi: Herfindahl concentration,
        # exact integer shares
        "lang_source_hhi": """
            WITH hhc AS (SELECT lang, source,
                                CAST(count(*) AS BIGINT) AS n
                         FROM documents GROUP BY 1, 2)
            SELECT lang, CAST(sum(n) AS BIGINT) AS n_docs,
                   CAST(sum(n * n) * 1000000
                        // (sum(n) * sum(n)) AS BIGINT) AS hhi_micro
            FROM hhc GROUP BY lang
        """,
        # pipelines/mlstats.doc_edit_pairs: levenshtein on the LSH
        # candidate set (200-char heads)
        "doc_edit_pairs": f"""
            SELECT c.doc_a, c.doc_b,
                   CAST(levenshtein(substr(da.text, 1, 200),
                                    substr(db.text, 1, 200))
                        AS BIGINT) AS edit_dist
            FROM ({_sql_minhash_candidates(tok, 3)}) c
            JOIN documents da ON da.doc_id = c.doc_a
            JOIN documents db ON db.doc_id = c.doc_b
        """,
        # pipelines/mlstats.ann_ndcg: position-weighted ANN ranking
        # quality vs the exact top-k (quantised 1/log2 weights)
        "ann_ndcg": f"""
            WITH nde AS ({_SQL_KNN_EXACT}),
            nda AS (
                SELECT 'ivf' AS method, query_id, vec_id, score
                FROM read_parquet('{art["ivf_topk"]}')
                UNION ALL
                SELECT 'lsh', query_id, vec_id, score
                FROM read_parquet('{art["lsh_topk"]}')),
            ndr AS (SELECT method, query_id, vec_id,
                           row_number() OVER (
                               PARTITION BY method, query_id
                               ORDER BY score DESC, vec_id) AS pos
                    FROM nda),
            ndw AS (SELECT i AS pos,
                           CAST(floor(1e6 / log2(i + 1) + 0.5) AS BIGINT)
                               AS w
                    FROM generate_series(1, {ANN_K}) AS t(i)),
            ndi AS (SELECT CAST(sum(w) AS BIGINT) AS idcg FROM ndw),
            ndd AS (SELECT r.method, r.query_id,
                           CAST(coalesce(sum(
                               CASE WHEN e.vec_id IS NOT NULL
                               THEN w.w END), 0) AS BIGINT) AS dcg
                    FROM ndr r
                    JOIN ndw w USING (pos)
                    LEFT JOIN nde e ON e.query_id = r.query_id
                                   AND e.vec_id = r.vec_id
                    GROUP BY 1, 2)
            SELECT d.method, d.query_id, d.dcg,
                   CAST(d.dcg * 1000000 // ndi.idcg AS BIGINT)
                       AS ndcg_micro
            FROM ndd d CROSS JOIN ndi
        """,
        # pipelines/mlstats.ann_rbo: truncated rank-biased overlap
        # (p=0.9) vs the exact ranking — exact-rational integer lift,
        # one HUGEINT product, no float
        "ann_rbo": f"""
            WITH rbe AS ({_SQL_KNN_EXACT}),
            reb AS (SELECT query_id, vec_id,
                           row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, vec_id) AS pb
                    FROM rbe),
            rba AS (
                SELECT 'ivf' AS method, query_id, vec_id, score
                FROM read_parquet('{art["ivf_topk"]}')
                UNION ALL
                SELECT 'lsh', query_id, vec_id, score
                FROM read_parquet('{art["lsh_topk"]}')),
            rap AS (SELECT method, query_id, vec_id,
                           row_number() OVER (
                               PARTITION BY method, query_id
                               ORDER BY score DESC, vec_id) AS pa
                    FROM rba),
            mm AS (SELECT a.method, a.query_id,
                          greatest(a.pa, b.pb) AS m
                   FROM rap a JOIN reb b ON b.query_id = a.query_id
                                        AND b.vec_id = a.vec_id),
            rqs AS (SELECT m.method, q.query_id
                    FROM (SELECT 'ivf' AS method
                          UNION ALL SELECT 'lsh') m
                    CROSS JOIN (SELECT DISTINCT query_id FROM rbe) q),
            rwt AS (SELECT * FROM (VALUES {rbo_wt}) AS t(d, w)),
            rov AS (SELECT rqs.method, rqs.query_id, rwt.d, rwt.w,
                           (SELECT count(*) FROM mm
                            WHERE mm.method = rqs.method
                              AND mm.query_id = rqs.query_id
                              AND mm.m <= rwt.d) AS o
                    FROM rqs CROSS JOIN rwt)
            SELECT method, query_id,
                   CAST(sum(o * w) AS BIGINT) AS t_num,
                   CAST((CAST(sum(o * w) AS HUGEINT) * 1000000)
                        // {rbo_den} AS BIGINT) AS rbo_micro
            FROM rov GROUP BY method, query_id
        """,
        # pipelines/mlstats.ann_rrf: reciprocal-rank fusion of the
        # IVF/LSH lists (Cormack 2009) — 1e9 // (60+r) nano weights,
        # pure integer, exact-membership flag
        "ann_rrf": f"""
            WITH rra AS (
                SELECT 'ivf' AS method, query_id, vec_id, score
                FROM read_parquet('{art["ivf_topk"]}')
                UNION ALL
                SELECT 'lsh', query_id, vec_id, score
                FROM read_parquet('{art["lsh_topk"]}')),
            rrr AS (SELECT method, query_id, vec_id,
                           row_number() OVER (
                               PARTITION BY method, query_id
                               ORDER BY score DESC, vec_id) AS r
                    FROM rra),
            rrs AS (SELECT query_id, vec_id,
                           CAST(sum(1000000000 // (60 + r)) AS BIGINT)
                               AS rrf_nano
                    FROM rrr GROUP BY ALL),
            rrk AS (SELECT query_id, vec_id, rrf_nano,
                           row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_nano DESC, vec_id) AS rank
                    FROM rrs),
            rre AS (SELECT query_id, vec_id
                    FROM ({_SQL_KNN_EXACT}))
            SELECT k.query_id, k.vec_id, k.rrf_nano,
                   CAST(k.rank AS BIGINT) AS rank,
                   CAST(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0
                        END AS BIGINT) AS in_exact
            FROM rrk k LEFT JOIN rre e ON e.query_id = k.query_id
                                      AND e.vec_id = k.vec_id
            WHERE k.rank <= 10
        """,
        # pipelines/mlstats.qty_price_spearman: exact Spearman via
        # average-rank integers (2r+cnt−1), HUGEINT moments, one float
        "qty_price_spearman": """
            WITH spb AS (
                SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS xq,
                       CAST(floor(l_extendedprice * 100 + 0.5)
                            AS BIGINT) AS yc
                FROM lineitem),
            spx AS (SELECT xq, CAST(count(*) AS BIGINT) AS cx
                    FROM spb GROUP BY xq),
            spu AS (SELECT xq,
                           2 * coalesce(sum(cx) OVER (ORDER BY xq
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) + cx + 1 AS u
                    FROM spx),
            spy AS (SELECT yc, CAST(count(*) AS BIGINT) AS cy
                    FROM spb GROUP BY yc),
            spv AS (SELECT yc,
                           2 * coalesce(sum(cy) OVER (ORDER BY yc
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) + cy + 1 AS v
                    FROM spy),
            spc AS (SELECT xq, yc, CAST(count(*) AS BIGINT) AS c
                    FROM spb GROUP BY 1, 2),
            spt AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                           CAST(sum(CAST(c AS HUGEINT) * u) AS HUGEINT)
                               AS su,
                           CAST(sum(CAST(c AS HUGEINT) * v) AS HUGEINT)
                               AS sv,
                           CAST(sum(CAST(c AS HUGEINT) * u * v)
                                AS HUGEINT) AS suv,
                           CAST(sum(CAST(c AS HUGEINT) * u * u)
                                AS HUGEINT) AS su2,
                           CAST(sum(CAST(c AS HUGEINT) * v * v)
                                AS HUGEINT) AS sv2
                    FROM spc JOIN spu USING (xq) JOIN spv USING (yc))
            SELECT n,
                   CAST(CASE WHEN n * su2 - su * su <> 0
                              AND n * sv2 - sv * sv <> 0
                        THEN floor(CAST(n * suv - su * sv AS DOUBLE)
                             / sqrt(CAST(n * su2 - su * su AS DOUBLE)
                                    * CAST(n * sv2 - sv * sv AS DOUBLE))
                             * 1e6 + 0.5) END AS BIGINT) AS rho_micro
            FROM spt
        """,
        # pipelines/mlstats.source_profile_cosine: exact integer
        # dot/norm sums over (token, source) counts
        "source_profile_cosine": f"""
            WITH pcw AS (SELECT {tok} AS toks, source FROM documents),
            pcf AS (SELECT unnest(toks) AS token, source FROM pcw),
            pcc AS MATERIALIZED (
                SELECT token, source, CAST(count(*) AS BIGINT) AS c
                FROM pcf GROUP BY 1, 2),
            pcd AS MATERIALIZED (
                SELECT a.source AS src_a, b.source AS src_b,
                       CAST(sum(a.c * b.c) AS HUGEINT) AS dot
                FROM pcc a JOIN pcc b ON a.token = b.token
                                      AND a.source <= b.source
                GROUP BY 1, 2)
            SELECT d.src_a, d.src_b, CAST(d.dot AS BIGINT) AS dot,
                   CAST(floor(CAST(d.dot AS DOUBLE)
                              / sqrt(CAST(na.dot AS DOUBLE)
                                     * CAST(nb.dot AS DOUBLE))
                              * 1e6 + 0.5) AS BIGINT) AS cos_micro
            FROM pcd d
            JOIN pcd na ON na.src_a = d.src_a AND na.src_b = d.src_a
            JOIN pcd nb ON nb.src_a = d.src_b AND nb.src_b = d.src_b
            WHERE d.src_a < d.src_b
        """,
        # pipelines/mlstats.customer_revenue_pareto: exact NTILE
        # deciles over per-customer revenue, integer shares
        "customer_revenue_pareto": """
            WITH crr AS (
                SELECT o_custkey,
                       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT)) AS BIGINT) AS rev
                FROM orders GROUP BY 1),
            crn AS (SELECT rev,
                           ntile(10) OVER (ORDER BY rev, o_custkey)
                               AS decile
                    FROM crr),
            cra AS (SELECT decile,
                           CAST(count(*) AS BIGINT) AS n_customers,
                           CAST(sum(rev) AS BIGINT) AS rev_cents
                    FROM crn GROUP BY 1),
            crt AS (SELECT CAST(sum(rev_cents) AS HUGEINT) AS tot
                    FROM cra)
            SELECT CAST(decile AS BIGINT) AS decile, n_customers,
                   rev_cents,
                   CAST(CAST(rev_cents AS HUGEINT) * 1000000 // crt.tot
                        AS BIGINT) AS share_micro
            FROM cra, crt
        """,
        # pipelines/mlstats.embedding_jl_projection: md5-parity ±1
        # signs, integer matmul in long format
        "embedding_jl_projection": """
            WITH jlb AS (SELECT vec_id,
                                CAST(unnest(embedding) AS DOUBLE) AS e,
                                generate_subscripts(embedding, 1) AS d
                         FROM embeddings),
            jlq AS (SELECT vec_id, d - 1 AS d0,
                           CAST(floor(e * 1e6 + 0.5) AS BIGINT) AS em
                    FROM jlb),
            jls AS (SELECT d0, j,
                           1 - 2 * CAST(md5_number_upper(
                               CAST(d0 AS VARCHAR) || ':'
                               || CAST(j AS VARCHAR)) % 2 AS BIGINT)
                               AS sgn
                    FROM (SELECT DISTINCT d0 FROM jlq)
                    CROSS JOIN generate_series(0, 7) AS t(j))
            SELECT q.vec_id, CAST(s.j AS BIGINT) AS j,
                   CAST(sum(q.em * s.sgn) AS BIGINT) AS proj_micro
            FROM jlq q JOIN jls s USING (d0)
            GROUP BY 1, 2
        """,
        # stages/pagerank.degree_assortativity: Newman r per term ego
        # graph, both-direction pairs, exact integer moments
        "cooc_assortativity": f"""
            WITH cae AS MATERIALIZED (
                SELECT term, w, v FROM ({_sql_cooc_edges(tr, tok, gaz)})),
            can AS (SELECT term, w AS nd FROM cae
                    UNION ALL SELECT term, v FROM cae),
            cad AS MATERIALIZED (
                SELECT term, nd, CAST(count(*) AS BIGINT) AS d
                FROM can GROUP BY 1, 2),
            cap AS (SELECT e.term, dw.d AS x, dv.d AS y
                    FROM cae e
                    JOIN cad dw ON dw.term = e.term AND dw.nd = e.w
                    JOIN cad dv ON dv.term = e.term AND dv.nd = e.v
                    UNION ALL
                    SELECT e.term, dv.d, dw.d
                    FROM cae e
                    JOIN cad dw ON dw.term = e.term AND dw.nd = e.w
                    JOIN cad dv ON dv.term = e.term AND dv.nd = e.v),
            cam AS (SELECT term, CAST(count(*) AS BIGINT) AS m2,
                           CAST(sum(x) AS HUGEINT) AS sx,
                           CAST(sum(x * y) AS HUGEINT) AS sxy,
                           CAST(sum(x * x) AS HUGEINT) AS sx2
                    FROM cap GROUP BY term)
            SELECT term, CAST(m2 // 2 AS BIGINT) AS n_edges,
                   CAST(CASE WHEN m2 * sx2 - sx * sx <> 0
                        THEN floor(CAST(m2 * sxy - sx * sx AS DOUBLE)
                                   / CAST(m2 * sx2 - sx * sx AS DOUBLE)
                                   * 1e6 + 0.5) END AS BIGINT) AS r_micro
            FROM cam
        """,
        # pipelines/mlstats.priority_price_ks: two-sample KS D with an
        # exact integer ECDF numerator
        "priority_price_ks": """
            WITH ksb AS (
                SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                           AS cents,
                       CASE WHEN o_orderpriority = '1-URGENT'
                            THEN 1 ELSE 0 END AS ga
                FROM orders
                WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
            ksd AS (SELECT cents, CAST(sum(ga) AS BIGINT) AS cca,
                           CAST(sum(1 - ga) AS BIGINT) AS ccb
                    FROM ksb GROUP BY cents),
            ksc AS (SELECT cents,
                           sum(cca) OVER (ORDER BY cents) AS cuma,
                           sum(ccb) OVER (ORDER BY cents) AS cumb
                    FROM ksd),
            kst AS (SELECT CAST(sum(cca) AS BIGINT) AS n_a,
                           CAST(sum(ccb) AS BIGINT) AS n_b FROM ksd)
            SELECT kst.n_a, kst.n_b,
                   CAST(max(abs(CAST(cuma AS HUGEINT) * kst.n_b
                                - CAST(cumb AS HUGEINT) * kst.n_a))
                        * 1000000
                        // (CAST(kst.n_a AS HUGEINT) * kst.n_b)
                        AS BIGINT) AS d_micro
            FROM ksc, kst
            GROUP BY kst.n_a, kst.n_b
        """,
        # pipelines/mlstats.langid_kappa: chance-corrected agreement
        # over the langid confusion matrix
        "langid_kappa": f"""
            WITH kcc AS MATERIALIZED (
                SELECT d.lang, l.lang_pred, CAST(count(*) AS BIGINT) AS n
                FROM documents d
                JOIN ({_sql_doc_langid_model(art['langid_profile'])}) l USING (doc_id)
                GROUP BY ALL),
            kct AS (SELECT CAST(sum(n) AS BIGINT) AS n_docs,
                           CAST(coalesce(sum(n) FILTER (
                               WHERE lang = lang_pred), 0) AS BIGINT)
                               AS diag
                    FROM kcc),
            kcr AS (SELECT lang AS lab, CAST(sum(n) AS BIGINT) AS rn
                    FROM kcc GROUP BY 1),
            kcl AS (SELECT lang_pred AS lab, CAST(sum(n) AS BIGINT) AS cn
                    FROM kcc GROUP BY 1),
            kcp AS (SELECT CAST(sum(CAST(coalesce(r.rn, 0) AS HUGEINT)
                                    * coalesce(c.cn, 0)) AS HUGEINT)
                               AS pe
                    FROM kcr r FULL JOIN kcl c USING (lab))
            SELECT t.n_docs, t.diag AS n_agree,
                   CAST(CASE WHEN CAST(t.n_docs AS HUGEINT) * t.n_docs
                                  - p.pe <> 0
                        THEN floor(CAST(CAST(t.n_docs AS HUGEINT)
                                        * t.diag - p.pe AS DOUBLE)
                                   / CAST(CAST(t.n_docs AS HUGEINT)
                                          * t.n_docs - p.pe AS DOUBLE)
                                   * 1e6 + 0.5) END AS BIGINT)
                       AS kappa_micro
            FROM kct t, kcp p
        """,
        # pipelines/mlstats.dup_score_lift: decile lift of the quality
        # score against the near-dup drop list
        "dup_score_lift": f"""
            WITH dld AS ({droplist_sql}),
            dls AS (SELECT q.doc_id,
                           CAST(floor(alpha_ratio * 1e6 + 0.5)
                                AS BIGINT) AS s
                    FROM ({_sql_doc_quality(stop)}) q),
            dll AS (SELECT dls.doc_id, dls.s,
                           CASE WHEN d.doc_id IS NOT NULL
                                THEN 1 ELSE 0 END AS is_dup
                    FROM dls LEFT JOIN dld d USING (doc_id)),
            dln AS (SELECT s, is_dup,
                           ntile(10) OVER (ORDER BY s, doc_id) AS decile
                    FROM dll),
            dla AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
                           CAST(sum(is_dup) AS BIGINT) AS n_dup
                    FROM dln GROUP BY 1),
            dlt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nt,
                           CAST(sum(n_dup) AS BIGINT) AS nd FROM dla)
            SELECT CAST(decile AS BIGINT) AS decile, n_docs, n_dup,
                   CAST(CASE WHEN dlt.nd > 0
                        THEN CAST(n_dup AS HUGEINT) * dlt.nt * 1000000
                             // (CAST(n_docs AS HUGEINT) * dlt.nd)
                        END AS BIGINT) AS lift_micro
            FROM dla, dlt
        """,
        # pipelines/mlstats.qty_line_kendall: tau-b from cell-pair
        # concordance with tie corrections
        "qty_line_kendall": """
            WITH klc AS MATERIALIZED (
                SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
                       CAST(l_linenumber AS BIGINT) AS y,
                       CAST(count(*) AS BIGINT) AS c
                FROM lineitem GROUP BY 1, 2),
            klp AS (SELECT
                        CAST(coalesce(sum(CASE WHEN a.y < b.y
                             THEN a.c * b.c END), 0) AS HUGEINT) AS conc,
                        CAST(coalesce(sum(CASE WHEN a.y > b.y
                             THEN a.c * b.c END), 0) AS HUGEINT) AS disc
                    FROM klc a JOIN klc b
                      ON a.x < b.x AND a.y <> b.y),
            klt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM klc),
            klx AS (SELECT CAST(sum(CAST(t AS HUGEINT) * (t - 1) // 2)
                                AS HUGEINT) AS n1
                    FROM (SELECT sum(c) AS t FROM klc GROUP BY x)),
            kly AS (SELECT CAST(sum(CAST(t AS HUGEINT) * (t - 1) // 2)
                                AS HUGEINT) AS n2
                    FROM (SELECT sum(c) AS t FROM klc GROUP BY y)),
            kl0 AS (SELECT CAST(klt.n AS HUGEINT) * (klt.n - 1) // 2
                               AS n0, klt.n FROM klt)
            SELECT kl0.n, CAST(klp.conc AS BIGINT) AS concordant,
                   CAST(klp.disc AS BIGINT) AS discordant,
                   CAST(CASE WHEN (kl0.n0 - klx.n1) * (kl0.n0 - kly.n2)
                                  <> 0
                        THEN floor(CAST(klp.conc - klp.disc AS DOUBLE)
                             / sqrt(CAST(kl0.n0 - klx.n1 AS DOUBLE)
                                    * CAST(kl0.n0 - kly.n2 AS DOUBLE))
                             * 1e6 + 0.5) END AS BIGINT) AS tau_b_micro
            FROM kl0, klp, klx, kly
        """,
        # pipelines/mlstats.status_trimmed_mean: exact rank-trimmed
        # robust mean per status
        "status_trimmed_mean": """
            WITH tmb AS (SELECT o_orderstatus,
                                CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT) AS cents, o_orderkey
                         FROM orders),
            tmr AS (SELECT o_orderstatus, cents,
                           row_number() OVER (PARTITION BY o_orderstatus
                               ORDER BY cents, o_orderkey) - 1 AS rk,
                           count(*) OVER (PARTITION BY o_orderstatus)
                               AS n
                    FROM tmb),
            tmk AS (SELECT o_orderstatus, cents
                    FROM tmr WHERE rk >= n * 10 // 100
                               AND rk < n - n * 10 // 100)
            SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_kept,
                   CAST(CAST(sum(cents) AS HUGEINT) * 1000000
                        // count(*) AS BIGINT)
                       AS trimmed_mean_micro_cents
            FROM tmk GROUP BY o_orderstatus
        """,
        # pipelines/mlstats.dup_source_matrix: near-dup pairs per
        # unordered source-feed pair over the jaccard chain
        "dup_source_matrix": f"""
            SELECT least(da.source, db.source) AS source_a,
                   greatest(da.source, db.source) AS source_b,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM ({_sql_jaccard_pairs(tok)}) p
            JOIN documents da ON da.doc_id = p.doc_a
            JOIN documents db ON db.doc_id = p.doc_b
            GROUP BY 1, 2
        """,
        # stages/induce.sense_modularity: weighted Newman modularity of
        # the CW partition per term (integer Q·4m² identity)
        "sense_modularity": _sql_sense_modularity(tr, tok, gaz),
        # relational_ext.orders_scd2_history: SCD2 validity rows over
        # the same derived CDC stream (LEAD version - 1, NULL current)
        "orders_scd2_history": """
            WITH base AS (
                SELECT o_orderkey, 1 AS version,
                       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                           AS cents
                FROM orders),
            chg AS (
                SELECT o_orderkey, 2 AS version, cents + 500 AS cents
                FROM base WHERE o_orderkey % 10 = 0
                UNION ALL
                SELECT o_orderkey + 100000000, 2, cents
                FROM base WHERE o_orderkey % 97 = 0),
            u AS (SELECT * FROM base UNION ALL SELECT * FROM chg)
            SELECT o_orderkey, CAST(version AS BIGINT) AS version,
                   cents,
                   CAST(lead(version) OVER w - 1 AS BIGINT) AS valid_to,
                   CAST(CASE WHEN lead(version) OVER w IS NULL
                             THEN 1 ELSE 0 END AS BIGINT) AS is_current
            FROM u
            WINDOW w AS (PARTITION BY o_orderkey ORDER BY version)
        """,
        # analytics.order_price_cume: CUME_DIST on the two-pass exact
        # rank machinery, 6 dp half-up (ties share)
        "order_price_cume": """
            SELECT o_orderkey, o_orderstatus,
                   floor(cume_dist() OVER (
                       PARTITION BY o_orderstatus
                       ORDER BY CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT)) * 1e6 + 0.5) / 1e6
                       AS cd6
            FROM orders
        """,
        # analytics.order_price_percentile_cont: interpolated
        # percentiles lifted to exact integer centi-cents
        "order_price_percentile_cont": """
            WITH c AS (SELECT o_orderstatus AS f,
                              CAST(floor(o_totalprice * 100 + 0.5)
                                   AS BIGINT) AS cents,
                              o_orderkey AS id
                       FROM orders),
            r AS (SELECT f, cents,
                         row_number() OVER (PARTITION BY f
                                            ORDER BY cents, id) AS rn,
                         count(*) OVER (PARTITION BY f) AS n
                  FROM c),
            ps AS (SELECT unnest([25, 50, 75]) AS p),
            t AS (SELECT f, p,
                         (p * (n - 1)) // 100 + 1 AS lo_rn,
                         (p * (n - 1)) % 100 AS rem
                  FROM (SELECT DISTINCT f, n FROM r) CROSS JOIN ps),
            lo AS (SELECT t.f, t.p, t.rem, r.cents AS vlo
                   FROM t JOIN r ON r.f = t.f AND r.rn = t.lo_rn),
            hi AS (SELECT t.f, t.p, r.cents AS vhi
                   FROM t JOIN r ON r.f = t.f AND r.rn = t.lo_rn + 1
                   WHERE t.rem > 0)
            SELECT lo.f AS o_orderstatus, CAST(lo.p AS BIGINT) AS p,
                   CAST(100 * vlo + lo.rem
                        * (COALESCE(hi.vhi, vlo) - vlo) AS BIGINT)
                       AS val_centi
            FROM lo LEFT JOIN hi ON hi.f = lo.f AND hi.p = lo.p
        """,
        # analytics.customer_cohort_retention: first-order-month cohorts
        # x months-since-cohort, distinct customers per cell
        "customer_cohort_retention": """
            WITH o AS (SELECT o_custkey,
                              CAST(year(o_orderdate) * 12
                                   + month(o_orderdate) AS BIGINT) AS m
                       FROM orders),
            c AS (SELECT o_custkey, MIN(m) AS cm FROM o
                  GROUP BY o_custkey),
            j AS (SELECT DISTINCT o.o_custkey, c.cm AS cohort_m,
                         o.m - c.cm AS delta_months
                  FROM o JOIN c USING (o_custkey))
            SELECT cohort_m, delta_months,
                   CAST(count(*) AS BIGINT) AS n_customers
            FROM j GROUP BY cohort_m, delta_months
        """,
        # analytics.lineitem_mad: two percentile_disc(0.5)-style order
        # statistics under the shared (value, id) sort — median of
        # cents, then median of |cents - median|
        "lineitem_mad": """
            WITH p AS (SELECT l_returnflag AS f,
                              CAST(floor(l_extendedprice * 100 + 0.5)
                                   AS BIGINT) AS cents,
                              l_orderkey * 10 + l_linenumber AS id
                       FROM lineitem),
            r1 AS (SELECT f, cents,
                          row_number() OVER (PARTITION BY f
                                             ORDER BY cents, id) AS rn,
                          count(*) OVER (PARTITION BY f) AS n
                   FROM p),
            med AS (SELECT f, CAST(n AS BIGINT) AS n,
                           cents AS median_cents
                    FROM r1 WHERE rn = (n * 50 + 99) // 100),
            d AS (SELECT p.f, ABS(p.cents - m.median_cents) AS dev,
                         p.id, m.n, m.median_cents
                  FROM p JOIN med m ON m.f = p.f),
            r2 AS (SELECT f, dev, n, median_cents,
                          row_number() OVER (PARTITION BY f
                                             ORDER BY dev, id) AS rn
                   FROM d)
            SELECT f AS l_returnflag, n, median_cents,
                   dev AS mad_cents
            FROM r2 WHERE rn = (n * 50 + 99) // 100
        """,
        # analytics.orders_weighted_sample: integer exponential-race
        # stand-in — k smallest (md5_64(key) >> 34) * 1e6 // w_cents
        # analytics.orders_weighted_sample_by_status: stratified variant
        # of the priority sample — k smallest per status
        "orders_weighted_sample_by_status": """
            WITH w AS (SELECT o_orderstatus, o_orderkey,
                              CAST(floor(o_totalprice * 100 + 0.5)
                                   AS BIGINT) AS w_cents
                       FROM orders),
            pr AS (SELECT o_orderstatus, o_orderkey, w_cents,
                          CAST(((md5_number_upper(
                                     CAST(o_orderkey AS VARCHAR)) >> 34)
                                * 1000000) // w_cents AS BIGINT)
                              AS priority
                   FROM w)
            SELECT o_orderstatus, o_orderkey, w_cents, priority
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY o_orderstatus
                      ORDER BY priority, o_orderkey) AS rk FROM pr)
            WHERE rk <= 40
        """,
        # analytics.doc_readability_percentile: PERCENT_RANK of the
        # Flesch micro-units (RANK ties), exact integer contract
        "doc_readability_percentile": r"""
            WITH c AS (SELECT doc_id,
                              CAST(len(list_filter(
                                  regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')) AS BIGINT) AS w,
                              CAST(greatest(len(regexp_extract_all(
                                  text, '[.!?]+')), 1) AS BIGINT) AS s,
                              CAST(len(regexp_extract_all(
                                  lower(text), '[aeiouy]+'))
                                  AS BIGINT) AS sy
                       FROM documents),
            fm AS (SELECT doc_id,
                          CAST(floor((206.835
                                      - 1.015 * (CAST(w AS DOUBLE) / s)
                                      - 84.6 * (CAST(sy AS DOUBLE) / w))
                                     * 1e6 + 0.5) AS BIGINT)
                              AS flesch_micro
                   FROM c WHERE w > 0)
            SELECT doc_id, flesch_micro,
                   CASE WHEN count(*) OVER () = 1 THEN 0
                        ELSE (rank() OVER (ORDER BY flesch_micro) - 1)
                             * 1000000 // (count(*) OVER () - 1)
                   END AS pr_micro
            FROM fm
        """,
        "orders_weighted_sample": """
            WITH w AS (SELECT o_orderkey,
                              CAST(floor(o_totalprice * 100 + 0.5)
                                   AS BIGINT) AS w_cents
                       FROM orders),
            pr AS (SELECT o_orderkey, w_cents,
                          CAST(((md5_number_upper(
                                     CAST(o_orderkey AS VARCHAR)) >> 34)
                                * 1000000) // w_cents AS BIGINT)
                              AS priority
                   FROM w)
            SELECT o_orderkey, w_cents, priority FROM pr
            ORDER BY priority, o_orderkey LIMIT 100
        """,
        "lineitem_winsorized": """
            WITH c AS (SELECT l_returnflag AS f,
                              CAST(floor(l_extendedprice * 100 + 0.5)
                                   AS BIGINT) AS cents,
                              l_orderkey * 10 + l_linenumber AS id
                       FROM lineitem),
            r AS (SELECT f, cents,
                         row_number() OVER (PARTITION BY f
                                            ORDER BY cents, id) AS rn,
                         count(*) OVER (PARTITION BY f) AS n
                  FROM c),
            cut AS (SELECT f,
                           max(CASE WHEN rn = (n * 5 + 99) // 100
                                    THEN cents END) AS lo_cents,
                           max(CASE WHEN rn = (n * 95 + 99) // 100
                                    THEN cents END) AS hi_cents
                    FROM r GROUP BY f)
            SELECT c.f AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(c.cents) AS BIGINT) AS sum_cents,
                   CAST(SUM(LEAST(GREATEST(c.cents, cut.lo_cents),
                                  cut.hi_cents)) AS BIGINT)
                       AS sum_wins_cents,
                   cut.lo_cents, cut.hi_cents
            FROM c JOIN cut ON cut.f = c.f
            GROUP BY c.f, cut.lo_cents, cut.hi_cents
        """,
        # relational_ext.orders_skyline: dominance-free frontier — the
        # mirror derives it the window way (per-cents max day vs the
        # exclusive running max over higher cents); pytest additionally
        # checks the NOT EXISTS dominance definition at sf0.001
        "orders_skyline": """
            WITH c AS (SELECT o_orderkey,
                              CAST(floor(o_totalprice * 100 + 0.5)
                                   AS BIGINT) AS cents,
                              CAST(epoch_us(o_orderdate) // 86400000000
                                   AS BIGINT) AS d
                       FROM orders),
            m AS (SELECT cents, max(d) AS dmax FROM c GROUP BY cents),
            r AS (SELECT cents, dmax,
                         max(dmax) OVER (ORDER BY cents DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS best_prev
                  FROM m),
            k AS (SELECT cents, dmax FROM r
                  WHERE best_prev IS NULL OR dmax > best_prev)
            SELECT c.o_orderkey, c.cents, c.d
            FROM c JOIN k ON k.cents = c.cents AND c.d = k.dmax
        """,
        # relational_ext.order_brand_pairs: co-purchase pair mining
        "order_brand_pairs": """
            WITH ob AS (SELECT DISTINCT l_orderkey, p_brand
                        FROM lineitem JOIN part
                             ON p_partkey = l_partkey)
            SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
                              AND a.p_brand < b.p_brand
            GROUP BY 1, 2
        """,
        # --- new this round: sequence / relational / fuzzy extensions ---
        # pipelines/queries.q_lang_vocab_stats: Heaps-law vocabulary
        # panel per language
        "lang_vocab_stats": f"""
            WITH vtoks AS (SELECT lang, {tok} AS toks FROM documents),
            vex AS (SELECT lang, unnest(toks) AS tk FROM vtoks)
            SELECT l.lang, l.n_docs, l.n_tokens,
                   coalesce(d.n_types, 0) AS n_types
            FROM (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                         CAST(coalesce(sum(len(toks)), 0) AS BIGINT)
                             AS n_tokens
                  FROM vtoks GROUP BY lang) l
            LEFT JOIN (SELECT lang,
                              CAST(count(DISTINCT tk) AS BIGINT)
                                  AS n_types
                       FROM vex GROUP BY lang) d ON d.lang = l.lang
        """,
        # relational_ext.orders_above_cust_avg: correlated subquery,
        # integer cross-multiplied comparison (no division)
        "orders_above_cust_avg": """
            WITH c AS (SELECT o_orderkey, o_custkey,
                              CAST(floor(o_totalprice * 100 + 0.5)
                                   AS BIGINT) AS price_cents
                       FROM orders),
            t AS (SELECT o_custkey, SUM(price_cents) AS s,
                         CAST(count(*) AS BIGINT) AS n
                  FROM c GROUP BY o_custkey)
            SELECT c.o_orderkey, c.o_custkey, c.price_cents
            FROM c JOIN t ON t.o_custkey = c.o_custkey
            WHERE c.price_cents * t.n > t.s
        """,
        # relational_ext.lineitem_loo_stats: leave-one-out aggregate
        "lineitem_loo_stats": """
            SELECT l_orderkey, l_linenumber,
                   CAST(count(*) OVER w - 1 AS BIGINT) AS loo_n,
                   CAST(sum(cents) OVER w - cents AS BIGINT)
                       AS loo_sum_cents
            FROM (SELECT l_orderkey, l_linenumber,
                         CAST(floor(l_extendedprice * 100 + 0.5)
                              AS BIGINT) AS cents
                  FROM lineitem)
            WINDOW w AS (PARTITION BY l_orderkey)
        """,
        # relational_ext.status_top_prices_dense: dense_rank <= 3 with
        # ties kept
        "status_top_prices_dense": """
            SELECT o_orderstatus, o_orderkey, price_cents,
                   CAST(drank AS BIGINT) AS drank
            FROM (SELECT o_orderstatus, o_orderkey,
                         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                             AS price_cents,
                         dense_rank() OVER (PARTITION BY o_orderstatus
                             ORDER BY CAST(floor(o_totalprice * 100
                                                 + 0.5) AS BIGINT) DESC)
                             AS drank
                  FROM orders)
            WHERE drank <= 3
        """,
        # relational_ext.user_event_types_list: grouped DISTINCT
        # ordered string_agg
        "user_event_types_list": """
            SELECT user_id,
                   CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
                   string_agg(DISTINCT event_type, ','
                              ORDER BY event_type) AS types
            FROM events GROUP BY user_id
        """,
        # stages/profile.profile_table: per-column row/null/exact-
        # distinct counts (count(DISTINCT) excludes nulls on both sides)
        "orders_profile": " UNION ALL ".join(f"""
            SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(*) - count({c}) AS BIGINT) AS n_null,
                   CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
            FROM orders""" for c in (
            "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority",
            "o_orderstatus", "o_totalprice")),
        # stages/profile.unpivot: melt of the wide pivot back to long
        # rows — equals the plain grouped count
        "user_event_unpivot": """
            SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY user_id, event_type
        """,
        # pipelines/sequences.user_purchase_carry: conditional fill-
        # forward — the carried value is a monotone max along the frame
        # (ts is the ordering key), so a filtered running max mirrors
        # the engine's grouped ffill exactly, NULLs included
        "user_purchase_carry": """
            SELECT event_id, user_id,
                   max(epoch_us(ts)) FILTER (event_type = 'purchase')
                       OVER win AS last_purchase_us,
                   epoch_us(ts)
                   - max(epoch_us(ts)) FILTER (event_type = 'purchase')
                         OVER win AS since_us
            FROM events
            WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING)
        """,
        # pipelines/sequences.customer_rolling_orders: trailing-7-row
        # frame sum/count in exact integer cents
        "customer_rolling_orders": """
            SELECT o_orderkey, o_custkey,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) OVER win AS BIGINT)
                       AS win_cents,
                   CAST(count(*) OVER win AS BIGINT) AS win_n
            FROM orders
            WINDOW win AS (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        """,
        # pipelines/sequences.user_cum_distinct_types: running DISTINCT
        # count as a cumulative sum of first-occurrence flags
        "user_cum_distinct_types": """
            WITH cd AS (SELECT event_id, ts, user_id,
                               CASE WHEN row_number() OVER (
                                   PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) = 1
                                    THEN 1 ELSE 0 END AS fst
                        FROM events)
            SELECT event_id, user_id,
                   CAST(sum(fst) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum_types
            FROM cd
        """,
        # pipelines/sequences.user_daily_dense: calendar densification
        # with zero fill between each user's first and last active day
        "user_daily_dense": dense_sql,
        # pipelines/sequences.user_daily_ewma: truncated dyadic EWMA
        # in Q20 fixed-point — the windowed self-join mirror computes
        # the identical integer Σ x·2^(19-k), no float on either side
        "user_daily_ewma": f"""
            WITH ewd AS ({dense_sql})
            SELECT a.user_id, a.day, a.n_events,
                   CAST(sum(b.n_events
                            * (CAST(1 AS BIGINT)
                               << CAST(19 - date_diff('day', b.day,
                                                      a.day)
                                       AS INTEGER))) AS BIGINT)
                       AS ewma_q20
            FROM ewd a JOIN ewd b
              ON b.user_id = a.user_id
             AND b.day BETWEEN a.day - INTERVAL 19 DAY AND a.day
            GROUP BY a.user_id, a.day, a.n_events
        """,
        # pipelines/relational_ext.purchase_nearby_clicks: ±30-min
        # band join within events (engine: tol-bucketed fan-out +
        # exact microsecond filter; mirror: the plain |Δts| <= tol
        # join)
        "purchase_nearby_clicks": """
            SELECT p.event_id,
                   CAST(count(*) AS BIGINT) AS n_nearby,
                   CAST(min(abs(epoch_us(c.ts) - epoch_us(p.ts)))
                        AS BIGINT) AS min_gap_us
            FROM events p JOIN events c
              ON c.user_id = p.user_id
             AND p.event_type = 'purchase'
             AND c.event_type = 'click'
             AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 1800000000
            GROUP BY p.event_id
        """,
        # pipelines/queries.q_user_burstiness: Fano factor over the
        # dense daily series (exact int sums, one float division)
        "user_burstiness": f"""
            WITH bdn AS ({dense_sql}),
            bg AS (SELECT user_id, CAST(count(*) AS BIGINT) AS d,
                          CAST(sum(n_events) AS BIGINT) AS sc,
                          CAST(sum(n_events * n_events) AS BIGINT)
                              AS sc2
                   FROM bdn GROUP BY user_id)
            SELECT user_id, d AS n_days, sc AS n_events,
                   CAST(floor(CAST(d * sc2 - sc * sc AS DOUBLE)
                              / CAST(d * sc AS DOUBLE) * 1e6 + 0.5)
                        AS BIGINT) AS fano_micro
            FROM bg
        """,
        # pipelines/sequences.user_daily_autocorr: lag-1 autocorrelation
        # over the dense daily series — n²-lifted exact integer moments,
        # one BIGINT→DOUBLE division at 6 dp; NULL on constant or n<2
        "user_daily_autocorr": f"""
            WITH acd AS ({dense_sql}),
            acl AS (SELECT user_id, day, n_events,
                           lag(n_events) OVER (PARTITION BY user_id
                                               ORDER BY day) AS prev
                    FROM acd),
            acm AS (SELECT user_id,
                           CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(n_events) AS BIGINT) AS s,
                           CAST(sum(n_events * n_events) AS BIGINT)
                               AS ss,
                           CAST(coalesce(sum(n_events * prev), 0)
                                AS BIGINT) AS sxy,
                           CAST(arg_min(n_events, day) AS BIGINT)
                               AS x0,
                           CAST(arg_max(n_events, day) AS BIGINT)
                               AS xl
                    FROM acl GROUP BY user_id)
            SELECT user_id, n AS n_days,
                   CASE WHEN n < 2 OR n * n * ss - n * s * s = 0
                        THEN NULL
                        ELSE CAST(floor(
                            CAST(n * n * sxy
                                 - n * s * (2 * s - x0 - xl)
                                 + (n - 1) * s * s AS DOUBLE)
                            / CAST(n * n * ss - n * s * s AS DOUBLE)
                            * 1e6 + 0.5) AS BIGINT)
                   END AS ac1_micro
            FROM acm
        """,
        # pipelines/sequences.daily_volume_cusum: all-integer CUSUM
        # change-point panel over corpus daily volume (dev = n*cum -
        # rank*S, peak at argmax |dev| with earliest-day ties)
        # pipelines/sequences.daily_volume_seasonal_naive: lag-7
        # forecasting baseline over the dense daily calendar, integer
        # errors (Hyndman & Athanasopoulos 2018 seasonal naive)
        "daily_volume_seasonal_naive": """
            WITH snc AS (SELECT date_trunc('day', ts) AS day,
                                CAST(count(*) AS BIGINT) AS n
                         FROM events GROUP BY 1),
            snsp AS (SELECT min(day) AS d0, max(day) AS d1 FROM snc),
            sncal AS (SELECT unnest(generate_series(
                                 d0, d1, INTERVAL 1 DAY)) AS day
                      FROM snsp),
            snd AS (SELECT sncal.day,
                           CAST(coalesce(snc.n, 0) AS BIGINT)
                               AS actual
                    FROM sncal LEFT JOIN snc ON snc.day = sncal.day)
            SELECT a.day, a.actual, b.actual AS forecast,
                   CAST(a.actual - b.actual AS BIGINT) AS err,
                   CAST(abs(a.actual - b.actual) AS BIGINT) AS abs_err
            FROM snd a JOIN snd b ON b.day = a.day - INTERVAL 7 DAY
        """,
        "daily_volume_cusum": """
            WITH dc AS (SELECT date_trunc('day', ts) AS day,
                               CAST(count(*) AS BIGINT) AS n_events
                        FROM events GROUP BY 1),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(n_events) AS BIGINT) AS s FROM dc),
            cu AS (SELECT day, n_events,
                          CAST(sum(n_events) OVER (ORDER BY day)
                               AS BIGINT) AS cum,
                          CAST(row_number() OVER (ORDER BY day)
                               AS BIGINT) AS rnk
                   FROM dc),
            cb AS (SELECT cu.day, cu.n_events, cu.cum,
                          CAST(tot.n * cu.cum - cu.rnk * tot.s
                               AS BIGINT) AS dev
                   FROM cu CROSS JOIN tot),
            pk AS (SELECT min(day) AS pday FROM cb
                   WHERE abs(dev) = (SELECT max(abs(dev)) FROM cb))
            SELECT day, n_events, cum, dev,
                   CAST(CASE WHEN day = pk.pday THEN 1 ELSE 0 END
                        AS BIGINT) AS is_peak
            FROM cb CROSS JOIN pk
        """,
        # pipelines/sequences.event_user_skew: shuffle-key skew report;
        # the top-k sum is over count VALUES so cutoff ties don't matter
        "event_user_skew": """
            WITH sc AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
                        FROM events GROUP BY user_id),
            st AS (SELECT CAST(sum(n) AS BIGINT) AS topk_sum
                   FROM (SELECT n FROM sc ORDER BY n DESC LIMIT 10))
            SELECT CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(sc.n) AS BIGINT) AS n_events,
                   min(sc.n) AS min_n, max(sc.n) AS max_n,
                   st.topk_sum,
                   st.topk_sum * 1000000 // CAST(sum(sc.n) AS BIGINT)
                       AS topk_share_micro
            FROM sc, st GROUP BY st.topk_sum
        """,
        # pipelines/sequences.user_event_gaps: LAG window, exact integer
        # microsecond arithmetic, (ts, event_id) tie-break
        "user_event_gaps": """
            SELECT event_id, user_id,
                   CAST(row_number() OVER win AS BIGINT) AS rn,
                   CAST(epoch_us(ts) - epoch_us(lag(ts) OVER win)
                        AS BIGINT) AS gap_us
            FROM events
            WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        # pipelines/sequences.user_event_path: ordered string_agg funnel
        "user_event_path": """
            SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                   string_agg(event_type, '>' ORDER BY ts, event_id)
                       AS path
            FROM events GROUP BY user_id
        """,
        # pipelines/sequences.user_top_event_type: grouped argmax, ties
        # to the lexicographically smallest type
        "user_top_event_type": """
            WITH c AS (SELECT user_id, event_type,
                              CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY user_id, event_type),
            r AS (SELECT *, row_number() OVER (
                      PARTITION BY user_id
                      ORDER BY n DESC, event_type) AS rk FROM c)
            SELECT user_id, event_type, n FROM r WHERE rk = 1
        """,
        # sequences.user_event_neighbors: LAG + LEAD linkage
        "user_event_neighbors": """
            SELECT event_id, user_id,
                   lag(event_id) OVER win AS prev_event_id,
                   lead(event_id) OVER win AS next_event_id
            FROM events
            WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        # relational_ext.lineitem_cube3: 3-dim CUBE, GROUPING mask with
        # the first argument most significant
        "lineitem_cube3": """
            WITH c AS (SELECT l_returnflag, l_linestatus,
                              CAST(year(l_shipdate) AS BIGINT)
                                  AS ship_year,
                              CAST(floor(l_extendedprice * 100 + 0.5)
                                   AS BIGINT) AS cents
                       FROM lineitem)
            SELECT l_returnflag, l_linestatus, ship_year,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents,
                   CAST(GROUPING(l_returnflag, l_linestatus, ship_year)
                        AS BIGINT) AS lvl
            FROM c GROUP BY CUBE (l_returnflag, l_linestatus, ship_year)
        """,
        # relational_ext.customer_order_event_recon: FULL OUTER join of
        # two pre-aggregated sides, COALESCE both ways
        "customer_order_event_recon": """
            WITH o AS (SELECT o_custkey AS k,
                              CAST(count(*) AS BIGINT) AS n_orders,
                              SUM(CAST(floor(o_totalprice * 100 + 0.5)
                                  AS BIGINT)) AS order_cents
                       FROM orders GROUP BY o_custkey),
            e AS (SELECT user_id AS k,
                         CAST(count(*) AS BIGINT) AS n_events,
                         SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                             AS event_cents
                  FROM events GROUP BY user_id)
            SELECT COALESCE(o.k, e.k) AS k,
                   COALESCE(o.n_orders, 0) AS n_orders,
                   CAST(COALESCE(o.order_cents, 0) AS BIGINT)
                       AS order_cents,
                   COALESCE(e.n_events, 0) AS n_events,
                   CAST(COALESCE(e.event_cents, 0) AS BIGINT)
                       AS event_cents
            FROM o FULL OUTER JOIN e ON o.k = e.k
        """,
        # relational_ext.repeat_buyers: INTERSECT set semantics
        "repeat_buyers": """
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
            INTERSECT
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        """,
        # relational_ext.orders_cube: GROUP BY CUBE, lvl = GROUPING mask
        # (first argument most significant)
        "orders_cube": """
            WITH c AS (SELECT o_orderstatus,
                              CAST(year(o_orderdate) AS BIGINT) AS o_year,
                              CAST(floor(o_totalprice * 100 + 0.5)
                                   AS BIGINT) AS cents
                       FROM orders)
            SELECT o_orderstatus, o_year,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents,
                   CAST(GROUPING(o_orderstatus, o_year) AS BIGINT) AS lvl
            FROM c GROUP BY CUBE (o_orderstatus, o_year)
        """,
        # pipelines/mlstats.lineitem_group_ols: OLS fit from the SAME
        # exact HUGEINT moments as lineitem_moments — slope = cv/dx,
        # intercept = (sy - slope*sx)/n on the UNROUNDED slope,
        # r2 = cv*cv/(dx*dy), each a single float expression on exact
        # integers, half-up 6 dp (identical operation order to numpy)
        "lineitem_group_ols": """
            WITH q AS (SELECT l_returnflag,
                              CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
                              CAST(floor(l_extendedprice + 0.5) AS BIGINT)
                                  AS y
                       FROM lineitem),
            m AS (SELECT l_returnflag,
                         CAST(count(*) AS HUGEINT) AS n,
                         SUM(CAST(x AS HUGEINT)) AS sx,
                         SUM(CAST(y AS HUGEINT)) AS sy,
                         SUM(CAST(x AS HUGEINT) * x) AS sxx,
                         SUM(CAST(y AS HUGEINT) * y) AS syy,
                         SUM(CAST(x AS HUGEINT) * y) AS sxy
                  FROM q GROUP BY l_returnflag),
            d AS (SELECT *, n * sxx - sx * sx AS dx,
                         n * syy - sy * sy AS dy,
                         n * sxy - sx * sy AS cv FROM m),
            s AS (SELECT *, CAST(cv AS DOUBLE) / CAST(dx AS DOUBLE)
                                AS slope_raw
                  FROM d)
            SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                   CASE WHEN dx = 0 THEN NULL
                        ELSE floor(slope_raw * 1e6 + 0.5) / 1e6 END
                       AS slope6,
                   CASE WHEN dx = 0 THEN NULL
                        ELSE floor((CAST(sy AS DOUBLE)
                                    - slope_raw * CAST(sx AS DOUBLE))
                                   / CAST(n AS DOUBLE) * 1e6 + 0.5)
                             / 1e6 END AS intercept6,
                   CASE WHEN dx = 0 OR dy = 0 THEN NULL
                        ELSE floor(CAST(cv AS DOUBLE) * CAST(cv AS DOUBLE)
                                   / (CAST(dx AS DOUBLE)
                                      * CAST(dy AS DOUBLE))
                                   * 1e6 + 0.5) / 1e6 END AS r2_6
            FROM s
        """,
        # pipelines/mlstats.event_value_outliers: exact percentile_cont
        # integers (centi-micro) + Tukey fences lifted to x2/x3 integer
        # comparisons — the mirror recomputes the identical rank
        # selection (0-based pos = p*(n-1)/100, lo/hi order statistics)
        "event_value_outliers": """
            WITH v AS (SELECT event_type,
                              CAST(floor(value * 1e6 + 0.5) AS BIGINT)
                                  AS vm
                       FROM events),
            o AS (SELECT event_type, vm,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY vm) AS rn,
                         count(*) OVER (PARTITION BY event_type) AS n
                  FROM v),
            qs AS (SELECT event_type, n,
                          max(CASE WHEN rn = (25 * (n - 1)) // 100 + 1
                                   THEN vm END) AS q1lo,
                          max(CASE WHEN rn = (25 * (n - 1)) // 100 + 2
                                   THEN vm END) AS q1hi,
                          max(CASE WHEN rn = (75 * (n - 1)) // 100 + 1
                                   THEN vm END) AS q3lo,
                          max(CASE WHEN rn = (75 * (n - 1)) // 100 + 2
                                   THEN vm END) AS q3hi
                   FROM o GROUP BY event_type, n),
            q AS (SELECT event_type, n,
                         100 * q1lo + ((25 * (n - 1)) % 100)
                             * (coalesce(q1hi, q1lo) - q1lo) AS q1c,
                         100 * q3lo + ((75 * (n - 1)) % 100)
                             * (coalesce(q3hi, q3lo) - q3lo) AS q3c
                  FROM qs)
            SELECT q.event_type, CAST(q.n AS BIGINT) AS n,
                   q.q1c AS q1_centi, q.q3c AS q3_centi,
                   CAST(sum(CASE WHEN 200 * v.vm
                                      < 2 * q.q1c - 3 * (q.q3c - q.q1c)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
                   CAST(sum(CASE WHEN 200 * v.vm
                                      > 2 * q.q3c + 3 * (q.q3c - q.q1c)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
            FROM v JOIN q USING (event_type)
            GROUP BY q.event_type, q.n, q.q1c, q.q3c
        """,
        # relational_ext.lineitem_moments: exact HUGEINT moment sums cast
        # to DOUBLE once; corr from the same integers, identical float
        # operation order, half-up 6 dp; whole-dollar price quantisation
        # (headroom contract — see the module docstring)
        "lineitem_moments": """
            WITH q AS (SELECT l_returnflag,
                              CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
                              CAST(floor(l_extendedprice + 0.5) AS BIGINT)
                                  AS y
                       FROM lineitem),
            m AS (SELECT l_returnflag,
                         CAST(count(*) AS HUGEINT) AS n,
                         SUM(CAST(x AS HUGEINT)) AS sx,
                         SUM(CAST(y AS HUGEINT)) AS sy,
                         SUM(CAST(x AS HUGEINT) * x) AS sxx,
                         SUM(CAST(y AS HUGEINT) * y) AS syy,
                         SUM(CAST(x AS HUGEINT) * y) AS sxy
                  FROM q GROUP BY l_returnflag),
            d AS (SELECT *, n * sxx - sx * sx AS d1,
                         n * syy - sy * sy AS d2,
                         n * sxy - sx * sy AS num FROM m)
            SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                   CAST(sx AS BIGINT) AS sum_qty,
                   CAST(sy AS BIGINT) AS sum_price_d,
                   CAST(sxx AS DOUBLE) AS sxx,
                   CAST(syy AS DOUBLE) AS syy,
                   CAST(sxy AS DOUBLE) AS sxy,
                   CASE WHEN d1 = 0 OR d2 = 0 THEN NULL
                        ELSE floor(CAST(num AS DOUBLE)
                                   / sqrt(CAST(d1 AS DOUBLE)
                                          * CAST(d2 AS DOUBLE))
                                   * 1e6 + 0.5) / 1e6 END AS corr6
            FROM d
        """,
        # stages/fuzzy.fuzzy_pairs_lev1: the oracle is the all-pairs
        # DEFINITION; the engine is deletion-neighborhood blocked with
        # exact verify (recall 1.0 for lev<=1) — same oracle-vs-engine
        # asymmetry as simhash_near_dup
        "part_name_fuzzy_pairs": """
            WITH v AS (SELECT DISTINCT p_name FROM part)
            SELECT a.p_name AS name_a, b.p_name AS name_b
            FROM v a JOIN v b ON a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= 1
        """,
        # relational_ext.lapsed_buyers: EXCEPT set semantics
        "lapsed_buyers": """
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
            EXCEPT
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        """,
        # relational_ext.nation_region_cross: broadcast nested-loop
        # cartesian (J-family CROSS JOIN case)
        "nation_region_cross": """
            SELECT n.n_name, r.r_name FROM nation n CROSS JOIN region r
        """,
        # analytics.order_price_rank: exact two-pass distributed rank
        # windows — rn has the o_orderkey tie-break, rnk orders by value
        # alone (SQL ties), pct6 = (rnk-1)/(N-1) from exact integers
        "order_price_rank": """
            WITH c AS (SELECT o_orderkey, o_orderstatus,
                              CAST(floor(o_totalprice * 100 + 0.5)
                                   AS BIGINT) AS cents
                       FROM orders),
            w AS (SELECT o_orderkey, o_orderstatus,
                         CAST(row_number() OVER (
                             PARTITION BY o_orderstatus
                             ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
                         CAST(rank() OVER (
                             PARTITION BY o_orderstatus
                             ORDER BY cents) AS BIGINT) AS rnk,
                         CAST(count(*) OVER (
                             PARTITION BY o_orderstatus) AS BIGINT) AS nn
                  FROM c)
            SELECT o_orderkey, o_orderstatus, rn, rnk,
                   CASE WHEN nn = 1 THEN NULL
                        ELSE floor(CAST(rnk - 1 AS DOUBLE) / (nn - 1)
                                   * 1e6 + 0.5) / 1e6 END AS pct6
            FROM w
        """,
        # relational_ext.lineitem_price_zscore: z lifted to integer
        # numerators, z = (n*y - sy)/sqrt(n*syy - sy^2), HUGEINT exact,
        # one double divide+sqrt in the engine's operation order
        "lineitem_price_zscore": """
            WITH q AS (SELECT l_orderkey, l_linenumber, l_returnflag,
                              CAST(floor(l_extendedprice + 0.5) AS BIGINT)
                                  AS y
                       FROM lineitem),
            m AS (SELECT l_returnflag,
                         CAST(count(*) AS HUGEINT) AS n,
                         SUM(CAST(y AS HUGEINT)) AS sy,
                         SUM(CAST(y AS HUGEINT) * y) AS syy
                  FROM q GROUP BY l_returnflag),
            d AS (SELECT l_returnflag, n, sy,
                         n * syy - sy * sy AS den FROM m)
            SELECT q.l_orderkey, q.l_linenumber,
                   CASE WHEN d.den <= 0 THEN NULL
                        ELSE floor(CAST(d.n * q.y - d.sy AS DOUBLE)
                                   / sqrt(CAST(d.den AS DOUBLE))
                                   * 1e6 + 0.5) / 1e6 END AS z6
            FROM q JOIN d USING (l_returnflag)
        """,
        # analytics.order_next_event: FORWARD as-of join — smallest
        # ts >= o_orderdate, ties to the smallest event_id
        "order_next_event": """
            SELECT o_orderkey, event_id FROM (
                SELECT o.o_orderkey, e.event_id,
                       row_number() OVER (PARTITION BY o.o_orderkey
                           ORDER BY e.ts ASC, e.event_id ASC) AS rn
                FROM orders o JOIN events e
                  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
            ) WHERE rn = 1
        """,
        # q_all_actor_keys: UNION (distinct) of two key streams
        "all_actor_keys": """
            SELECT o_custkey AS k FROM orders
            UNION
            SELECT user_id FROM events
        """,
        # relational_ext.region_revenue: TPC-H Q5-shaped join chain,
        # re-aggregated before every hop in the engine
        "region_revenue": """
            SELECT r_name,
                   CAST(count(*) AS BIGINT) AS n_items,
                   CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem
            JOIN orders   ON l_orderkey  = o_orderkey
            JOIN customer ON o_custkey   = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        # q_lang_top_tokens: grouped top-k over text, deterministic ties
        "lang_top_tokens": r"""
            WITH w AS (SELECT lang,
                              unnest(list_filter(
                                  regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')) AS tok
                       FROM documents),
            c AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS n
                  FROM w GROUP BY lang, tok),
            r AS (SELECT *, row_number() OVER (PARTITION BY lang
                      ORDER BY n DESC, tok) AS rk FROM c)
            SELECT lang, tok, n, CAST(rk AS BIGINT) AS rk
            FROM r WHERE rk <= 3
        """,
        # analytics.user_activity_deciles: NTILE(10) cohort segmentation
        # on the generic exact two-pass rank machinery
        "user_activity_deciles": """
            WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY user_id)
            SELECT user_id, n,
                   CAST(ntile(10) OVER (ORDER BY n, user_id) AS BIGINT)
                       AS decile
            FROM c
        """,
        # q_status_priciest_order: max_by aggregate, smallest-key ties
        "status_priciest_order": """
            WITH c AS (SELECT o_orderstatus, o_orderkey,
                              CAST(floor(o_totalprice * 100 + 0.5)
                                   AS BIGINT) AS max_cents
                       FROM orders),
            r AS (SELECT *, row_number() OVER (
                      PARTITION BY o_orderstatus
                      ORDER BY max_cents DESC, o_orderkey) AS rk FROM c)
            SELECT o_orderstatus, o_orderkey, max_cents
            FROM r WHERE rk = 1
        """,
        # stages/knn.quantize_stats: int8 scalar quantization; every
        # operand cast FLOAT->DOUBLE before the identical float op order
        "embedding_quantize_stats": """
            WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE)
                              AS x
                       FROM embeddings),
            m AS (SELECT vec_id, min(x) AS vmin, max(x) AS vmax,
                         CAST(count(*) AS BIGINT) AS n_dims
                  FROM e GROUP BY vec_id),
            c AS (SELECT e.vec_id,
                         CAST(floor((e.x - m.vmin) / (m.vmax - m.vmin)
                                    * 255 + 0.5) AS BIGINT) AS code
                  FROM e JOIN m USING (vec_id) WHERE m.vmax > m.vmin),
            s AS (SELECT vec_id, CAST(SUM(code) AS BIGINT) AS code_sum
                  FROM c GROUP BY vec_id)
            SELECT s.vec_id, m.n_dims, s.code_sum,
                   floor(m.vmin * 1e6 + 0.5) / 1e6 AS vmin6,
                   floor(m.vmax * 1e6 + 0.5) / 1e6 AS vmax6
            FROM s JOIN m USING (vec_id)
        """,
        # stages/sessions.session_conversions: same session rule as
        # user_sessions; conversion = a 'view' strictly before a
        # 'purchase' within the session, (ts, event_id) order
        "session_conversions": """
            WITH flagged AS (
                SELECT user_id, ts, event_id, event_type,
                       CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
                SELECT user_id, event_type,
                       sum(new_s) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) - 1 AS sid,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS pos
                FROM flagged
            ), agg AS (
                SELECT user_id, sid,
                       min(CASE WHEN event_type = 'view' THEN pos END)
                           AS vpos,
                       max(CASE WHEN event_type = 'purchase' THEN pos END)
                           AS ppos
                FROM sess GROUP BY user_id, sid
            )
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
                   CAST(SUM(CASE WHEN vpos IS NOT NULL
                                 AND ppos IS NOT NULL AND vpos < ppos
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
            FROM agg GROUP BY user_id
        """,
        # q_cooc_degree_stats: shape of the pruned NPMI ego graphs —
        # shares the flagship's window/count/weight CTE chain verbatim
        "cooc_degree_stats": f"""
            WITH {_sql_cooc_chain(tr, tok, gaz)},
            edges AS (SELECT term, w, v FROM weighted
                      WHERE npmi > {NPMI_MIN}),
            ec AS (SELECT term, CAST(count(*) AS BIGINT) AS n_edges
                   FROM edges GROUP BY term),
            nd AS (SELECT DISTINCT term, w AS nd FROM edges
                   UNION SELECT DISTINCT term, v FROM edges),
            nc AS (SELECT term, CAST(count(*) AS BIGINT) AS n_nodes
                   FROM nd GROUP BY term)
            SELECT ec.term, ec.n_edges, nc.n_nodes
            FROM ec JOIN nc USING (term)
        """,
        # stages/textstats.entropy_batch: per-term micro-nat quantisation
        # BEFORE the sum (order-free integer addition both sides), final
        # exact integer division
        # pipelines/queries.q_conv_sense_diversity: conversation-level
        # KG density over the linked-mention chain
        "conv_sense_diversity": f"""
            SELECT conv_id, CAST(count(*) AS BIGINT) AS n_mentions,
                   CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
                   CAST(count(DISTINCT CASE WHEN sense_id >= 0
                            THEN term || '#'
                                 || CAST(sense_id AS VARCHAR) END)
                        AS BIGINT) AS n_senses
            FROM ({linked_sel}) GROUP BY conv_id
        """,
        # pipelines/queries.q_nation_segment_entropy: grouped Shannon
        # entropy under the doc_entropy integer contract
        "nation_segment_entropy": """
            WITH nsc AS (SELECT CAST(c_nationkey AS BIGINT)
                                AS c_nationkey, c_mktsegment,
                                CAST(count(*) AS BIGINT) AS c
                         FROM customer
                         GROUP BY c_nationkey, c_mktsegment),
            nss AS (SELECT c_nationkey,
                           CAST(SUM(c) AS BIGINT) AS n,
                           CAST(count(*) AS BIGINT) AS n_segments,
                           SUM(CAST(floor((c * ln(c)) * 1e6 + 0.5)
                                    AS BIGINT)) AS s
                    FROM nsc GROUP BY c_nationkey)
            SELECT c_nationkey, n AS n_customers, n_segments,
                   CAST(CAST(floor(ln(n) * 1e6 + 0.5) AS BIGINT)
                        - (s // n) AS BIGINT) AS entropy_micro
            FROM nss
        """,
        "doc_entropy": r"""
            WITH tokrows AS (
                SELECT doc_id,
                       unnest(list_filter(
                           regexp_split_to_array(text, '\s+'),
                           w -> w <> '')) AS tok
                FROM documents),
            c AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
                  FROM tokrows GROUP BY doc_id, tok),
            s AS (SELECT doc_id,
                         SUM(CAST(floor((c * ln(c)) * 1e6 + 0.5)
                             AS BIGINT)) AS s,
                         CAST(SUM(c) AS BIGINT) AS n
                  FROM c GROUP BY doc_id)
            SELECT doc_id, n AS n_tokens,
                   CAST(CAST(floor(ln(n) * 1e6 + 0.5) AS BIGINT)
                        - (s // n) AS BIGINT) AS ent_micro
            FROM s WHERE n > 0
        """,
        "cooc_edges": _sql_cooc_edges(tr, tok, gaz),
        # integer-contract PageRank over the per-term NPMI ego graphs —
        # the third unrolled-CTE iterative mirror (stages/pagerank.py)
        "cooc_pagerank": _sql_cooc_pagerank(tr, tok, gaz, rounds=5),
        # stages/pagerank.hits_micro: HITS hubs/authorities, 3 unrolled
        # L1-normalised integer rounds over the NPMI ego graphs
        "cooc_hits": _sql_cooc_hits(tr, tok, gaz, rounds=3),
        # stages/pagerank.ppr_micro: personalized PageRank, hub teleport
        "cooc_ppr": _sql_cooc_ppr(tr, tok, gaz, rounds=5),
        # pipelines/queries.q_term_context_drift: per-term early/late JS
        "term_context_drift": _sql_term_context_drift(tr, tok, gaz),
        "cooc_pagerank_weighted": _sql_cooc_pagerank(
            tr, tok, gaz, rounds=5, weighted=True),
        # triangles + clustering coefficient (pagerank.triangle_stats):
        # canonical w<v edges make the path join enumerate each a<b<c
        # wedge once; wedges are exact integers d*(d-1)//2
        "cooc_triangles": f"""
            WITH {_sql_cooc_chain(tr, tok, gaz)},
            ed AS (SELECT term, w, v FROM weighted
                   WHERE npmi > {NPMI_MIN}),
            tri AS (SELECT e1.term,
                           CAST(count(*) AS BIGINT) AS n_triangles
                    FROM ed e1
                    JOIN ed e2 ON e2.term = e1.term AND e2.w = e1.v
                    JOIN ed e3 ON e3.term = e1.term AND e3.w = e1.w
                              AND e3.v = e2.v
                    GROUP BY e1.term),
            deg AS (SELECT term, node, CAST(count(*) AS BIGINT) AS d
                    FROM (SELECT term, w AS node FROM ed
                          UNION ALL SELECT term, v FROM ed)
                    GROUP BY term, node),
            wed AS (SELECT term,
                           CAST(SUM(d * (d - 1) // 2) AS BIGINT)
                               AS n_wedges
                    FROM deg GROUP BY term)
            SELECT w.term,
                   COALESCE(t.n_triangles, 0) AS n_triangles,
                   w.n_wedges,
                   CASE WHEN w.n_wedges = 0 THEN NULL
                        ELSE CAST((3 * COALESCE(t.n_triangles, 0)
                                   * 1000000) // w.n_wedges AS BIGINT)
                   END AS gcc_micro
            FROM wed w LEFT JOIN tri t ON t.term = w.term
        """,
        # stages/cooc.llr_edges: Dunning 1993 G² collocation
        # significance + Dice per pruned edge — micro-nat cell terms
        # over the 2×2 window contingency, exact doubling, integer Dice
        "cooc_llr": f"""
            WITH {_sql_cooc_chain(tr, tok, gaz)},
            lle AS (SELECT term, w, v, n FROM weighted
                    WHERE npmi > {NPMI_MIN}),
            llj AS (SELECT e.term, e.w, e.v,
                           CAST(e.n AS BIGINT) AS n,
                           CAST(uw.n_w AS BIGINT) AS cw,
                           CAST(uv.n_w AS BIGINT) AS cv,
                           CAST(t.nn AS BIGINT) AS nn
                    FROM lle e
                    JOIN totcnt t ON t.term = e.term
                    JOIN unicnt uw ON uw.term = e.term
                                  AND uw.tok = e.w
                    JOIN unicnt uv ON uv.term = e.term
                                  AND uv.tok = e.v)
            SELECT term, w, v, n,
                   CAST(2 * (
                       CASE WHEN n > 0 THEN CAST(floor(n * ln(
                           (CAST(n AS DOUBLE) * nn)
                           / (CAST(cw AS DOUBLE) * cv))
                           * 1e6 + 0.5) AS BIGINT) ELSE 0 END
                     + CASE WHEN cw - n > 0 THEN CAST(floor(
                           (cw - n) * ln(
                           (CAST(cw - n AS DOUBLE) * nn)
                           / (CAST(cw AS DOUBLE) * (nn - cv)))
                           * 1e6 + 0.5) AS BIGINT) ELSE 0 END
                     + CASE WHEN cv - n > 0 THEN CAST(floor(
                           (cv - n) * ln(
                           (CAST(cv - n AS DOUBLE) * nn)
                           / (CAST(nn - cw AS DOUBLE) * cv))
                           * 1e6 + 0.5) AS BIGINT) ELSE 0 END
                     + CASE WHEN nn - cw - cv + n > 0 THEN CAST(floor(
                           (nn - cw - cv + n) * ln(
                           (CAST(nn - cw - cv + n AS DOUBLE) * nn)
                           / (CAST(nn - cw AS DOUBLE) * (nn - cv)))
                           * 1e6 + 0.5) AS BIGINT) ELSE 0 END)
                       AS BIGINT) AS g2_micro,
                   CAST((2 * n * 1000000) // (cw + cv) AS BIGINT)
                       AS dice_micro
            FROM llj
        """,
        # stages/pagerank.clustering_coefficients: per-node LOCAL
        # clustering coefficient — triangles explode to member nodes,
        # lcc = (2*T*1e6) // (d*(d-1)), NULL when deg < 2
        "cooc_clustering_coef": f"""
            WITH {_sql_cooc_chain(tr, tok, gaz)},
            ed AS MATERIALIZED (SELECT term, w, v FROM weighted
                                WHERE npmi > {NPMI_MIN}),
            ctri AS MATERIALIZED (
                SELECT e1.term, e1.w AS a, e1.v AS b, e2.v AS c
                FROM ed e1
                JOIN ed e2 ON e2.term = e1.term AND e2.w = e1.v
                JOIN ed e3 ON e3.term = e1.term AND e3.w = e1.w
                          AND e3.v = e2.v),
            tcnt AS (SELECT term, node,
                            CAST(count(*) AS BIGINT) AS t
                     FROM (SELECT term, a AS node FROM ctri
                           UNION ALL SELECT term, b FROM ctri
                           UNION ALL SELECT term, c FROM ctri)
                     GROUP BY term, node),
            cdeg AS (SELECT term, node, CAST(count(*) AS BIGINT) AS deg
                     FROM (SELECT term, w AS node FROM ed
                           UNION ALL SELECT term, v FROM ed)
                     GROUP BY term, node)
            SELECT d.term, d.node, d.deg,
                   CAST(COALESCE(t.t, 0) AS BIGINT) AS n_triangles,
                   CASE WHEN d.deg < 2 THEN NULL
                        ELSE CAST((2 * COALESCE(t.t, 0) * 1000000)
                                  // (d.deg * (d.deg - 1)) AS BIGINT)
                   END AS lcc_micro
            FROM cdeg d LEFT JOIN tcnt t
                 ON t.term = d.term AND t.node = d.node
        """,
        # the induced inventory itself, hash-checked (VERDICT r03 item 1):
        # clustering unrolled into CTE rounds under the cw.py v2 integer
        # determinism contract (see _sql_sense_inventory)
        "sense_inventory": _sql_sense_inventory(tr, tok, gaz, algo="cw"),
        # pipelines/queries.q_sense_inventory_stats: model-size rollup
        # over the SQL-checked induced inventory
        "sense_inventory_stats": f"""
            SELECT term,
                   CAST(count(DISTINCT sense_id) AS BIGINT) AS n_senses,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(CAST(floor(weight * 1e6 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_weight_micro
            FROM ({_sql_sense_inventory(tr, tok, gaz, algo="cw")})
            GROUP BY term
        """,
        # pipelines/queries.q_mention_link_rate: per-term link-rate
        # panel over the linked-mention chain
        "mention_link_rate": f"""
            WITH lg AS (SELECT term, CAST(count(*) AS BIGINT)
                               AS n_mentions,
                               CAST(count(*) FILTER (sense_id >= 0)
                                    AS BIGINT) AS n_linked
                        FROM ({linked_sel}) GROUP BY term)
            SELECT term, n_mentions, n_linked,
                   n_linked * 1000000 // n_mentions AS link_micro
            FROM lg
        """,
        # pipelines/queries.q_triples_by_pred_daily: KG growth per
        # predicate per first-provenance day
        "triples_by_pred_daily": f"""
            SELECT pred, date_trunc('day', ts) AS day,
                   CAST(count(*) AS BIGINT) AS n
            FROM ({_sql_triples(linked_sel)}) GROUP BY 1, 2
        """,
        # pipelines/kg.kg_inverse_preds: inverse/symmetric predicate
        # mining — reversed-endpoint self-join over the triple chain,
        # full pred grid with integer inversehood scores
        "kg_inverse_preds": f"""
            WITH kit AS MATERIALIZED (
                SELECT subj, pred, obj
                FROM ({_sql_triples(linked_sel)})),
            kib AS (SELECT pred, CAST(count(*) AS BIGINT) AS n
                    FROM kit GROUP BY pred),
            kip AS (SELECT a.pred AS pred_a, b.pred AS pred_b,
                           CAST(count(*) AS BIGINT) AS n_pairs
                    FROM kit a JOIN kit b ON b.subj = a.obj
                                         AND b.obj = a.subj
                    GROUP BY ALL)
            SELECT ba.pred AS pred_a, bb.pred AS pred_b,
                   CAST(coalesce(p.n_pairs, 0) AS BIGINT) AS n_pairs,
                   ba.n AS n_a,
                   CAST(coalesce(p.n_pairs, 0) * 1000000 // ba.n
                        AS BIGINT) AS inv_score_micro
            FROM kib ba CROSS JOIN kib bb
            LEFT JOIN kip p ON p.pred_a = ba.pred
                           AND p.pred_b = bb.pred
        """,
        "sense_inventory_hyperlex": _sql_sense_inventory(
            tr, tok, gaz, algo="hyperlex"),
        "doc_langid": _sql_doc_langid(),
        "doc_langid_model": _sql_doc_langid_model(art["langid_profile"]),
        # wsid_ray/embedmodel.TfidfHashEmbedder: signed feature hashing
        # (md5_number_upper; bucket = h % dim, sign = bit 63) of
        # tf x idf_micro, idf read from the shared trained artifact;
        # zero-sum buckets dropped on both sides
        "doc_tfidf_embedding": f"""
            WITH te_idf AS MATERIALIZED (
                SELECT token, idf_micro FROM read_parquet('{art["idf"]}')),
            te_tok AS (SELECT doc_id, unnest({tok}) AS tk FROM documents),
            te_h AS (SELECT doc_id, tk, md5_number_upper(tk) AS h
                     FROM te_tok),
            te_v AS (SELECT t.doc_id AS vec_id,
                            CAST(t.h % 32 AS BIGINT) AS bucket,
                            (CASE WHEN (t.h >> 63) & 1 = 1 THEN -1
                                  ELSE 1 END)
                            * coalesce(i.idf_micro, 1000000) AS v
                     FROM te_h t
                     LEFT JOIN te_idf i ON i.token = t.tk)
            SELECT vec_id, bucket, CAST(sum(v) AS BIGINT) AS val
            FROM te_v GROUP BY 1, 2 HAVING sum(v) <> 0
        """,
        # stages/knn.near_dup_pairs_exact_int over the trained
        # TfidfHashEmbedder: integer cosine threshold cos > 4/5 decided
        # by HUGEINT cross-multiplication — no float anywhere, so the
        # mirror is exact by construction (dot ≤ √(na2·nb2) < 2**53 by
        # Cauchy-Schwarz; 25·dot² < 2**104 fits HUGEINT)
        "doc_tfidf_near_dup": f"""
            WITH tn_idf AS MATERIALIZED (
                SELECT token, idf_micro FROM read_parquet('{art["idf"]}')),
            tn_tok AS (SELECT doc_id, unnest({tok}) AS tk FROM documents),
            tn_h AS (SELECT doc_id, tk, md5_number_upper(tk) AS h
                     FROM tn_tok),
            tn_v AS (SELECT t.doc_id,
                            CAST(t.h % 32 AS BIGINT) AS bucket,
                            (CASE WHEN (t.h >> 63) & 1 = 1 THEN -1
                                  ELSE 1 END)
                            * coalesce(i.idf_micro, 1000000) AS v
                     FROM tn_h t
                     LEFT JOIN tn_idf i ON i.token = t.tk),
            tn_vec AS MATERIALIZED (
                SELECT doc_id, bucket, CAST(sum(v) AS BIGINT) AS val
                FROM tn_v GROUP BY 1, 2 HAVING sum(v) <> 0),
            tn_norm AS MATERIALIZED (
                SELECT doc_id, sum(CAST(val AS HUGEINT) * val) AS n2
                FROM tn_vec GROUP BY 1),
            tn_dot AS (
                SELECT a.doc_id AS vec_a, b.doc_id AS vec_b,
                       sum(CAST(a.val AS HUGEINT) * b.val) AS dot
                FROM tn_vec a JOIN tn_vec b
                  ON a.bucket = b.bucket AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT d.vec_a, d.vec_b, CAST(d.dot AS BIGINT) AS dot,
                   CAST(na.n2 AS BIGINT) AS na2,
                   CAST(nb.n2 AS BIGINT) AS nb2
            FROM tn_dot d
            JOIN tn_norm na ON na.doc_id = d.vec_a
            JOIN tn_norm nb ON nb.doc_id = d.vec_b
            WHERE d.dot > 0 AND 25 * d.dot * d.dot > 16 * na.n2 * nb.n2
        """,
        # stages/bpe.train_bpe: distributed BPE tokenizer-vocab training
        # (Sennrich 2016), 6 merge rounds unrolled into CTE triples
        "bpe_merges": _sql_bpe_merges(rounds=6),
        # stages/bpe.subword_counts: corpus re-tokenized with the
        # trained 6-round vocab, (subword, n) frequencies
        "doc_bpe_subword_counts": _sql_bpe_merges(rounds=6,
                                                  subword_counts=True),
        # trained-vocab fertility per language (subwords per word)
        "bpe_fertility_by_lang": _sql_bpe_merges(rounds=6,
                                                 fertility=True),
        # pipelines/queries.q_doc_training_order: RNG-free reproducible
        # global shuffle (shard, pos) for the training-data writer
        "doc_training_order": """
            WITH hh AS (SELECT doc_id,
                        CAST(md5_number_upper(CAST(doc_id AS VARCHAR))
                             >> 1 AS BIGINT) AS h63
                        FROM documents)
            SELECT doc_id, CAST(h63 % 8 AS BIGINT) AS shard,
                   CAST(row_number() OVER (PARTITION BY h63 % 8
                        ORDER BY h63, doc_id) AS BIGINT) AS pos
            FROM hh
        """,
        # pipelines/queries.q_training_order_mix: per-batch source-mix
        # audit of the round-robin interleaved training order
        # (batch_id = ((pos-1)*S + shard) // B, all-integer shares)
        "training_order_mix": """
            WITH hh AS (SELECT doc_id, source,
                        CAST(md5_number_upper(CAST(doc_id AS VARCHAR))
                             >> 1 AS BIGINT) AS h63
                        FROM documents),
            tor AS (SELECT source, CAST(h63 % 8 AS BIGINT) AS shard,
                           CAST(row_number() OVER (PARTITION BY h63 % 8
                                ORDER BY h63, doc_id) AS BIGINT) AS pos
                    FROM hh),
            bt AS (SELECT ((pos - 1) * 8 + shard) // 256 AS batch_id,
                          source
                   FROM tor),
            sc AS (SELECT batch_id, source,
                          CAST(count(*) AS BIGINT) AS c
                   FROM bt GROUP BY ALL)
            SELECT CAST(batch_id AS BIGINT) AS batch_id,
                   CAST(sum(c) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_src,
                   CAST(max(c) AS BIGINT) AS max_src_n,
                   CAST(max(c) * 1000000 // sum(c) AS BIGINT)
                       AS top_share_micro
            FROM sc GROUP BY batch_id
        """,
        # stages/multimodal.MediaFeaturizer vs the fixture-side
        # expected-decode artifact (encoder bodies / JPEG encoder
        # reconstruction, NO Huffman): a wrong decode -> hash mismatch.
        # md5 runs over the uppercase hex of the decoded bytes (DuckDB
        # md5 takes VARCHAR only); byte mean via hex-pair explosion.
        "media_features": f"""
            WITH md AS (SELECT media_id, kind, hex(decoded) AS hs,
                               octet_length(decoded) AS nb
                        FROM read_parquet('{art["media_decoded"]}')),
            mb AS (SELECT media_id,
                          (strpos('0123456789ABCDEF',
                                  substr(hs, 2 * i - 1, 1)) - 1) * 16
                          + strpos('0123456789ABCDEF',
                                   substr(hs, 2 * i, 1)) - 1 AS val
                   FROM (SELECT media_id, hs,
                                unnest(range(1, nb + 1)) AS i
                         FROM md)),
            mm AS (SELECT media_id, avg(val) AS m FROM mb GROUP BY 1)
            SELECT d.media_id, d.kind, CAST(d.nb AS BIGINT) AS n_bytes,
                   floor(coalesce(mm.m, 0.0) * 1e6 + 0.5) / 1e6
                       AS mean_val,
                   md5(d.hs) AS content_hash
            FROM md d LEFT JOIN mm USING (media_id)
        """,
        # recursive-CTE mirror of the distributed hash-to-min union-find
        # rounds (D3): reachability closure over near-dup pairs, min label
        # composed end-to-end MinHash dedup chain: LSH candidates ->
        # exact Jaccard verify -> reachability closure -> drop non-min
        "doc_near_dup_drops": droplist_sql,
        "doc_near_dup_drops_checkpointed": droplist_sql,
        "doc_near_dup_keep_longest": keep_longest_sql,
        # pipelines/queries.q_source_dedup_impact: per-feed curation
        # impact of the end-to-end near-dup chain
        "source_dedup_impact": f"""
            WITH sdd AS ({droplist_sql})
            SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(sdd.doc_id) AS BIGINT) AS n_dropped,
                   CAST((count(*) - count(sdd.doc_id)) * 1000000
                        // count(*) AS BIGINT) AS keep_micro
            FROM documents d
            LEFT JOIN sdd ON sdd.doc_id = d.doc_id
            GROUP BY d.source
        """,
        "doc_dup_components": dupcomp_sql,
        # pipelines/queries.q_dup_component_sizes: component-size
        # histogram over the same components
        "dup_component_sizes": f"""
            SELECT component_size,
                   CAST(count(*) AS BIGINT) AS n_components
            FROM (SELECT canon_id,
                         CAST(count(*) AS BIGINT) AS component_size
                  FROM ({dupcomp_sql}) GROUP BY canon_id)
            GROUP BY component_size
        """,
        # pipelines/queries.q_purchase_click_attribution: backward
        # as-of with a 1 h tolerance (closed interval on both sides)
        "purchase_click_attribution": """
            SELECT purchase_id, user_id, click_id, gap_us FROM (
                SELECT p.event_id AS purchase_id, p.user_id,
                       c.event_id AS click_id,
                       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT)
                           AS gap_us,
                       row_number() OVER (PARTITION BY p.event_id
                           ORDER BY c.ts DESC, c.event_id DESC) AS rn
                FROM events p
                JOIN events c ON c.user_id = p.user_id
                             AND c.event_type = 'click'
                             AND c.ts <= p.ts
                             AND c.ts >= p.ts - INTERVAL 1 HOUR
                WHERE p.event_type = 'purchase'
            ) WHERE rn = 1
        """,
        # pipelines/queries.q_events_dow_hour_heatmap: ISO dow x hour
        # seasonality counts
        "events_dow_hour_heatmap": """
            SELECT CAST(isodow(ts) AS BIGINT) AS dow,
                   CAST(hour(ts) AS BIGINT) AS hour,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        """,
        # pipelines/queries.q_user_median_gap: per-user
        # percentile_disc(0.5) over the LAG gap contract
        "user_median_gap": """
            WITH gg AS (SELECT user_id, event_id,
                               epoch_us(ts) - epoch_us(lag(ts) OVER (
                                   PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS gap_us
                        FROM events),
            gv AS (SELECT * FROM gg WHERE gap_us IS NOT NULL),
            gr AS (SELECT user_id, gap_us,
                          row_number() OVER (PARTITION BY user_id
                              ORDER BY gap_us, event_id) AS rn,
                          CAST(count(*) OVER (PARTITION BY user_id)
                               AS BIGINT) AS n
                   FROM gv)
            SELECT user_id, n, CAST(gap_us AS BIGINT) AS median_gap_us
            FROM gr WHERE rn = (n * 50 + 99) // 100
        """,
        # pipelines/queries.q_event_type_transitions: Markov bigram
        # counts over each user's ordered event stream
        "event_type_transitions": """
            WITH mtr AS (SELECT event_type,
                                lag(event_type) OVER (
                                    PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev_type
                         FROM events)
            SELECT prev_type, event_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM mtr WHERE prev_type IS NOT NULL GROUP BY 1, 2
        """,
        # pipelines/mlstats.event_transition_entropy: empirical entropy
        # rate of the event-type chain — KL-family micro-nat cell
        # quantisation, truncating // finish
        "event_transition_entropy": """
            WITH etr AS (SELECT event_type,
                                lag(event_type) OVER (
                                    PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev_type
                         FROM events),
            cells AS (SELECT prev_type, event_type,
                             CAST(count(*) AS BIGINT) AS c
                      FROM etr WHERE prev_type IS NOT NULL
                      GROUP BY 1, 2),
            rtt AS (SELECT prev_type, CAST(sum(c) AS BIGINT) AS r
                    FROM cells GROUP BY 1),
            ntt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
            terms AS (SELECT CAST(floor(c * ln(CAST(c AS DOUBLE) / r)
                                 * 1e6 + 0.5) AS BIGINT) AS t
                      FROM cells JOIN rtt USING (prev_type))
            SELECT ntt.n AS n_transitions,
                   CAST(-sum(t) AS BIGINT) AS h_sum_micro,
                   CAST((-sum(t)) // ntt.n AS BIGINT)
                       AS entropy_rate_micro
            FROM terms, ntt GROUP BY ntt.n
        """,
        # flagship sense chain downstream of the induced inventory
        # (artifact-anchored — see _sql_linked_mentions / artifacts.py)
        "mentions_linked": linked_sel,
        "canon_map": f"""
            WITH RECURSIVE {_sql_canon_chain(linked_sel)}
            SELECT entity_id, canon_id FROM cn_map
        """,
        "triples": _sql_triples(linked_sel),
        "triple_support": _sql_triple_support(linked_sel),
        # pipelines/queries.q_kg_growth_daily: distinct-triple growth
        # curve (new per first_ts day + cumulative KG size)
        "kg_growth_daily": f"""
            WITH kgs AS ({_sql_triple_support(linked_sel)}),
            kgd AS (SELECT date_trunc('day', first_ts) AS day,
                           CAST(count(*) AS BIGINT) AS n_new
                    FROM kgs GROUP BY 1)
            SELECT day, n_new,
                   CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT)
                       AS cum_triples
            FROM kgd
        """,
        # pipelines/queries.q_triple_conflicts: functional-predicate
        # contradiction list over the deduped triples
        "triple_conflicts": f"""
            WITH tcf AS (SELECT DISTINCT subj, obj
                         FROM ({_sql_triples(linked_sel)})
                         WHERE pred = '{PRED_ADDRESSES}')
            SELECT subj, CAST(count(*) AS BIGINT) AS n_objs,
                   string_agg(obj, ',' ORDER BY obj) AS objs
            FROM tcf GROUP BY subj HAVING count(*) > 1
        """,
        # pipelines/kg.kg_two_hop_paths: SPARQL-shaped a→mid→c over the
        # deduped co-mention edges (distinct intermediates per pair)
        "kg_two_hop_paths": f"""
            WITH RECURSIVE {_sql_triples_chain(linked_sel)},
            kg_e AS MATERIALIZED (
                SELECT subj, obj FROM (
                    SELECT subj, pred, obj FROM tr_all
                    QUALIFY row_number() OVER (
                        PARTITION BY subj, pred, obj
                        ORDER BY conv_id, turn_idx) = 1)
                WHERE pred = '{PRED_CO_MENTION}')
            SELECT e1.subj AS a, e2.obj AS c,
                   CAST(count(*) AS BIGINT) AS n_paths,
                   min(e1.obj) AS first_mid
            FROM kg_e e1 JOIN kg_e e2 ON e1.obj = e2.subj
            WHERE e1.subj <> e2.obj
            GROUP BY 1, 2
        """,
        # pipelines/kg.kg_entity_degree: per-entity degree profile over
        # the deduped store (out triples / preds / in co-mentions /
        # distinct neighbours)
        "kg_entity_degree": f"""
            WITH RECURSIVE {_sql_triples_chain(linked_sel)},
            kg_t AS MATERIALIZED (
                SELECT subj, pred, obj FROM tr_all
                QUALIFY row_number() OVER (
                    PARTITION BY subj, pred, obj
                    ORDER BY conv_id, turn_idx) = 1),
            kg_co AS MATERIALIZED (
                SELECT subj, obj FROM kg_t
                WHERE pred = '{PRED_CO_MENTION}'),
            kg_out AS (SELECT subj AS ent,
                              CAST(count(*) AS BIGINT) AS n_out,
                              CAST(count(DISTINCT pred) AS BIGINT)
                                  AS n_preds_out
                       FROM kg_t GROUP BY subj),
            kg_in AS (SELECT obj AS ent,
                             CAST(count(*) AS BIGINT) AS n_in_co
                      FROM kg_co GROUP BY obj),
            kg_nb AS (SELECT subj AS ent, obj AS nb FROM kg_co
                      UNION SELECT obj, subj FROM kg_co),
            kg_nbc AS (SELECT ent, CAST(count(DISTINCT nb) AS BIGINT)
                                  AS n_neighbors
                       FROM kg_nb GROUP BY ent),
            kg_ents AS (SELECT DISTINCT ent FROM (
                SELECT subj AS ent FROM kg_t
                UNION ALL SELECT obj FROM kg_co))
            SELECT e.ent,
                   CAST(coalesce(o.n_out, 0) AS BIGINT) AS n_out,
                   CAST(coalesce(o.n_preds_out, 0) AS BIGINT)
                       AS n_preds_out,
                   CAST(coalesce(i.n_in_co, 0) AS BIGINT) AS n_in_co,
                   CAST(coalesce(nn.n_neighbors, 0) AS BIGINT)
                       AS n_neighbors
            FROM kg_ents e
            LEFT JOIN kg_out o USING (ent)
            LEFT JOIN kg_in i USING (ent)
            LEFT JOIN kg_nbc nn USING (ent)
        """,
        # pipelines/kg.kg_pred_cooc: distinct subjects per unordered
        # predicate pair
        "kg_pred_cooc": f"""
            WITH RECURSIVE {_sql_triples_chain(linked_sel)},
            kg_sp AS MATERIALIZED (
                SELECT DISTINCT subj, pred FROM tr_all)
            SELECT a.pred AS pred_a, b.pred AS pred_b,
                   CAST(count(*) AS BIGINT) AS n_subjects
            FROM kg_sp a JOIN kg_sp b
                 ON a.subj = b.subj AND a.pred < b.pred
            GROUP BY 1, 2
        """,
        # pipelines/queries.q_key_uniqueness_report: per-key assertion
        # report (data-contract validation)
        "key_uniqueness_report": " UNION ALL ".join(f"""
            SELECT '{tbl}' AS table_name, '{key}' AS key_col,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(DISTINCT {key}) AS BIGINT) AS n_keys,
                   CAST(count(*) - count(DISTINCT {key}) AS BIGINT)
                       AS n_dup_keys
            FROM {tbl}""" for tbl, key in [
            ("orders", "o_orderkey"), ("events", "event_id"),
            ("customer", "c_custkey"), ("part", "p_partkey"),
            ("supplier", "s_suppkey"), ("documents", "doc_id"),
            ("embeddings", "vec_id")]),
        "triples_checkpointed": _sql_triples(linked_sel),
        # approximate-ANN quality, driver-checkable: engine IVF/LSH hits
        # (deterministic seeded artifacts) joined against the
        # INDEPENDENTLY-computed exact brute-force top-k
        "knn_recall": f"""
            WITH exact AS ({_SQL_KNN_EXACT}),
            approx AS (
                SELECT 'ivf' AS method, query_id, vec_id
                FROM read_parquet('{art["ivf_topk"]}')
                UNION ALL
                SELECT 'lsh', query_id, vec_id
                FROM read_parquet('{art["lsh_topk"]}')
            ),
            methods AS (SELECT unnest(['ivf', 'lsh']) AS method),
            hits AS (
                SELECT a.method, count(*) AS h
                FROM approx a
                JOIN exact e ON e.query_id = a.query_id
                            AND e.vec_id = a.vec_id
                GROUP BY a.method
            )
            SELECT m.method,
                   floor(coalesce(h.h, 0) * 1.0
                         / {len(ANN_QUERY_IDS) * ANN_K} * 1e6 + 0.5) / 1e6
                       AS recall_at_10
            FROM methods m LEFT JOIN hits h USING (method)
        """,
        "doc_minhash_candidates": _sql_minhash_candidates(tok),
        "doc_jaccard_pairs": _sql_jaccard_pairs(tok),
        "doc_minhash_est": _sql_minhash_est(tok),
        # pipelines/queries.q_doc_containment_pairs: asymmetric Broder
        # containment over LSH candidates (catches prefix-cut dups)
        "doc_containment_pairs": f"""
            SELECT doc_a, doc_b, cont_a_micro, cont_b_micro FROM (
                SELECT c.doc_a, c.doc_b,
                       CAST(floor(CAST(len(list_intersect(ca.shingles,
                                cb.shingles)) AS DOUBLE)
                            / len(ca.shingles) * 1e6 + 0.5) AS BIGINT)
                           AS cont_a_micro,
                       CAST(floor(CAST(len(list_intersect(ca.shingles,
                                cb.shingles)) AS DOUBLE)
                            / len(cb.shingles) * 1e6 + 0.5) AS BIGINT)
                           AS cont_b_micro
                FROM ({_sql_minhash_candidates(tok, 3)}) c
                JOIN ({_sql_shingles(tok, 3)}) ca ON ca.doc_id = c.doc_a
                JOIN ({_sql_shingles(tok, 3)}) cb ON cb.doc_id = c.doc_b
                WHERE len(ca.shingles) > 0 AND len(cb.shingles) > 0
            ) WHERE greatest(cont_a_micro, cont_b_micro) >= 800000
        """,
        "doc_lsh_bucket_stats": _sql_lsh_bucket_stats(tok),
        "doc_simhash": _sql_doc_simhash(tok),
        # all-pairs oracle for the banded engine stage — exact equivalence
        # is guaranteed by pigeonhole (max_hamming=3 < 4 bands)
        "simhash_near_dup": f"""
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
                       AS hamming
            FROM ({_sql_doc_simhash(tok)}) a
            JOIN ({_sql_doc_simhash(tok)}) b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        "turn_counts": f"""
            SELECT conv_id, count(*) AS n_turns,
                   max(turn_idx) AS max_turn_idx
            FROM {tr} GROUP BY conv_id
        """,
        "role_counts": f"""
            SELECT role, count(*) AS n FROM {tr} GROUP BY role
        """,
        "unigram_counts": f"""
            SELECT tok.token AS token, count(*) AS n
            FROM (SELECT unnest({tok}) AS token FROM {tr}) tok
            GROUP BY tok.token
        """,
        # pipelines/queries.q_token_zipf_fit: integer-contract
        # least-squares over micro-quantised logs (HUGEINT sums; slope
        # then intercept, each one float division, same op order)
        "token_zipf_fit": f"""
            WITH zu AS (SELECT tok.token AS token, count(*) AS n
                        FROM (SELECT unnest({tok}) AS token FROM {tr})
                            tok
                        GROUP BY tok.token),
            zr AS (SELECT n, row_number() OVER (ORDER BY n DESC, token)
                          AS rk
                   FROM zu),
            zq AS (SELECT CAST(floor(ln(CAST(rk AS DOUBLE)) * 1e6 + 0.5)
                               AS BIGINT) AS lx,
                          CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6 + 0.5)
                               AS BIGINT) AS ly
                   FROM zr),
            za AS (SELECT CAST(count(*) AS HUGEINT) AS nn,
                          SUM(CAST(lx AS HUGEINT)) AS sx,
                          SUM(CAST(ly AS HUGEINT)) AS sy,
                          SUM(CAST(lx AS HUGEINT) * ly) AS sxy,
                          SUM(CAST(lx AS HUGEINT) * lx) AS sxx
                   FROM zq),
            zs AS (SELECT nn, sx, sy,
                          CAST(nn * sxy - sx * sy AS DOUBLE)
                          / CAST(nn * sxx - sx * sx AS DOUBLE) AS slope
                   FROM za)
            SELECT CAST(nn AS BIGINT) AS n_types,
                   CAST(floor(slope * 1e6 + 0.5) AS BIGINT)
                       AS slope_micro,
                   CAST(floor((CAST(sy AS DOUBLE)
                               - slope * CAST(sx AS DOUBLE))
                              / CAST(nn AS DOUBLE) + 0.5) AS BIGINT)
                       AS intercept_micro
            FROM zs
        """,
        "mention_counts": f"""
            WITH toks AS (SELECT {tok} AS tokens FROM {tr}),
            pos AS (SELECT tokens, unnest(tokens) AS tok,
                           generate_subscripts(tokens, 1) AS p FROM toks)
            SELECT tok AS term, count(*) AS n
            FROM pos WHERE tok IN ({gaz})
            GROUP BY tok{multi_counts}
        """,
        # pipelines/queries.q_term_branching_entropy: Harris-style
        # left/right successor entropy per gazetteer term — KL-family
        # micro-nat cells, (−S)//N floor finish
        "term_branching_entropy": f"""
            WITH bts AS (SELECT {tok} AS tokens FROM {tr}),
            bpos AS (SELECT tokens, unnest(tokens) AS tok,
                            generate_subscripts(tokens, 1) AS p
                     FROM bts),
            bn0 AS (
                SELECT tok AS term, 'left' AS side,
                       tokens[p - 1] AS nb
                FROM bpos WHERE tok IN ({gaz}) AND p > 1
                UNION ALL
                SELECT tok, 'right', tokens[p + 1]
                FROM bpos WHERE tok IN ({gaz})
                  AND p + 1 <= len(tokens){branch_multi}
            ),
            bnc AS (SELECT term, side, nb,
                           CAST(count(*) AS BIGINT) AS c
                    FROM bn0 GROUP BY ALL),
            bnn AS (SELECT term, side, CAST(sum(c) AS BIGINT) AS n,
                           CAST(count(*) AS BIGINT) AS n_distinct
                    FROM bnc GROUP BY term, side),
            bns AS (SELECT bnc.term, bnc.side,
                           CAST(sum(CAST(floor(bnc.c
                               * ln(CAST(bnc.c AS DOUBLE)
                                    / CAST(bnn.n AS DOUBLE))
                               * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s
                    FROM bnc JOIN bnn ON bnn.term = bnc.term
                                     AND bnn.side = bnc.side
                    GROUP BY bnc.term, bnc.side)
            SELECT bnn.term, bnn.side, bnn.n, bnn.n_distinct,
                   CAST((-bns.s) // bnn.n AS BIGINT) AS h_micro
            FROM bnn JOIN bns ON bns.term = bnn.term
                             AND bns.side = bnn.side
        """,
        # pipelines/queries.q_term_burstiness: Church-Gale Fano factor
        # of per-conv mention counts over the whole conv population
        "term_burstiness": f"""
            WITH tbt AS (SELECT conv_id, {tok} AS tokens FROM {tr}),
            tbp AS (SELECT conv_id, tokens, unnest(tokens) AS tok,
                           generate_subscripts(tokens, 1) AS p
                    FROM tbt),
            tbm AS (SELECT conv_id, tok AS term FROM tbp
                    WHERE tok IN ({gaz}){burst_multi}),
            tbc AS (SELECT term, conv_id,
                           CAST(count(*) AS BIGINT) AS c
                    FROM tbm GROUP BY ALL),
            tbn AS (SELECT CAST(count(DISTINCT conv_id) AS BIGINT)
                           AS n FROM tbt),
            tba AS (SELECT term, CAST(count(*) AS BIGINT) AS k,
                           CAST(sum(c) AS BIGINT) AS s,
                           CAST(sum(c * c) AS BIGINT) AS s2
                    FROM tbc GROUP BY term)
            SELECT term, k AS n_convs_with, s AS n_mentions,
                   CAST(floor(CAST(tbn.n * s2 - s * s AS DOUBLE)
                        / CAST(tbn.n * s AS DOUBLE) * 1e6 + 0.5)
                        AS BIGINT) AS fano_micro
            FROM tba, tbn
        """,
        # pipelines/relational_ext.nation_revenue_share: percent-of-
        # parent rollup with in-region rank (exact // shares)
        "nation_revenue_share": """
            WITH nrs AS (SELECT n_name, r_name,
                                CAST(SUM(CAST(floor(l_extendedprice
                                     * 100 + 0.5) AS BIGINT))
                                     AS BIGINT) AS revenue_cents
                         FROM lineitem
                         JOIN orders   ON l_orderkey  = o_orderkey
                         JOIN customer ON o_custkey   = c_custkey
                         JOIN nation   ON c_nationkey = n_nationkey
                         JOIN region   ON n_regionkey = r_regionkey
                         GROUP BY n_name, r_name)
            SELECT r_name, n_name, revenue_cents,
                   CAST(revenue_cents * 1000000
                        // sum(revenue_cents) OVER (PARTITION BY r_name)
                        AS BIGINT) AS share_micro,
                   CAST(row_number() OVER (PARTITION BY r_name
                        ORDER BY revenue_cents DESC, n_name)
                        AS BIGINT) AS rnk
            FROM nrs
        """,
        # pipelines/sequences.customer_interorder_gap_median: reorder
        # cadence (int-or-half median of whole-day gaps)
        "customer_interorder_gap_median": """
            WITH iog AS (SELECT o_custkey,
                                epoch_us(o_orderdate) // 86400000000
                                    AS d
                         FROM orders),
            iol AS (SELECT o_custkey,
                           d - lag(d) OVER (PARTITION BY o_custkey
                                            ORDER BY d) AS gap
                    FROM iog)
            SELECT o_custkey AS c_custkey,
                   CAST(count(*) + 1 AS BIGINT) AS n_orders,
                   CAST(median(gap) AS DOUBLE) AS med_gap_days
            FROM iol WHERE gap IS NOT NULL GROUP BY o_custkey
        """,
        # pipelines/mlstats.order_price_psi: PSI drift panel between
        # order-timeline halves — equal-width cents bins, one float
        # chain per bin over exact integer cross products
        "order_price_psi": """
            WITH psb AS (SELECT epoch_us(o_orderdate) // 86400000000
                                    AS day,
                                CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT) AS cents
                         FROM orders),
            psx AS (SELECT (min(day) + max(day)) // 2 AS mid,
                           min(cents) AS mn,
                           max(cents) - min(cents) + 1 AS width
                    FROM psb),
            psh AS (SELECT CASE WHEN day <= psx.mid THEN 'early'
                                ELSE 'late' END AS half,
                           1 + ((cents - psx.mn) * 10) // psx.width
                               AS bin
                    FROM psb, psx),
            psc AS (SELECT half, bin, CAST(count(*) AS BIGINT) AS n
                    FROM psh GROUP BY ALL),
            pst AS (SELECT CAST(sum(CASE WHEN half = 'early' THEN n
                                    ELSE 0 END) AS BIGINT) AS na,
                           CAST(sum(CASE WHEN half = 'late' THEN n
                                    ELSE 0 END) AS BIGINT) AS nb
                    FROM psc),
            psg AS (SELECT b.bin,
                           CAST(coalesce(e.n, 0) AS BIGINT) AS a,
                           CAST(coalesce(l.n, 0) AS BIGINT) AS c
                    FROM (SELECT unnest(range(1, 11)) AS bin) b
                    LEFT JOIN psc e ON e.bin = b.bin
                                   AND e.half = 'early'
                    LEFT JOIN psc l ON l.bin = b.bin
                                   AND l.half = 'late')
            SELECT CAST(g.bin AS BIGINT) AS bin, g.a AS n_early,
                   g.c AS n_late,
                   CASE WHEN g.a = 0 OR g.c = 0 THEN NULL
                        ELSE CAST(floor(
                            CAST(g.a * t.nb - g.c * t.na AS DOUBLE)
                            / (CAST(t.na AS DOUBLE) * t.nb)
                            * ln((CAST(g.a AS DOUBLE) * t.nb)
                                 / (CAST(g.c AS DOUBLE) * t.na))
                            * 1e6 + 0.5) AS BIGINT)
                   END AS psi_term_micro
            FROM psg g, pst t
        """,
        # pipelines/mlstats.user_survival_km: Kaplan-Meier retention
        # curve in LOG space (per-time ln quantised to nano, exact
        # cumulative sum, no exp — libm exp is not contract-safe)
        "user_survival_km": """
            WITH kme AS (SELECT user_id,
                                epoch_us(ts) // 86400000000 AS d
                         FROM events),
            kms AS (SELECT user_id, min(d) AS d0, max(d) AS d1
                    FROM kme GROUP BY user_id),
            kmx AS (SELECT max(d1) AS dmax FROM kms),
            kml AS (SELECT d1 - d0 AS t,
                           CASE WHEN kmx.dmax - d1 > 7 THEN 1 ELSE 0
                           END AS e
                    FROM kms, kmx),
            kma AS (SELECT t, CAST(sum(e) AS BIGINT) AS d,
                           CAST(sum(1 - e) AS BIGINT) AS c
                    FROM kml GROUP BY t),
            kmr AS (SELECT t, d, c,
                           CAST((SELECT count(*) FROM kml) AS BIGINT)
                           - CAST(coalesce(sum(d + c) OVER (
                                 ORDER BY t ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND 1 PRECEDING), 0)
                                 AS BIGINT) AS n_risk
                    FROM kma),
            kmt AS (SELECT t, n_risk, d, c,
                           CASE WHEN d > 0 AND d < n_risk THEN
                               CAST(floor(ln(CAST(n_risk - d AS DOUBLE)
                                   / n_risk) * 1e9 + 0.5) AS BIGINT)
                                WHEN d = 0 THEN 0 END AS term,
                           max(CASE WHEN d >= n_risk THEN t END)
                               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                                     PRECEDING AND CURRENT ROW)
                               AS died_at
                    FROM kmr)
            SELECT CAST(t AS BIGINT) AS t, n_risk, d AS n_events,
                   c AS n_censored,
                   CASE WHEN died_at IS NOT NULL THEN NULL
                        ELSE CAST(sum(term) OVER (ORDER BY t)
                                  AS BIGINT)
                   END AS log_s_nano
            FROM kmt
        """,
        # pipelines/queries.q_table_null_audit: per-(table, column)
        # NULL counts across all ten corpus tables (ingest gate)
        "table_null_audit": null_audit_sql,
        # pipelines/queries.q_orders_benford: first-digit forensics
        "orders_benford": """
            WITH bd AS (SELECT CAST(substr(CAST(CAST(floor(
                                   o_totalprice * 100 + 0.5) AS BIGINT)
                                   AS VARCHAR), 1, 1) AS BIGINT)
                               AS digit
                        FROM orders),
            bg AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
                   FROM bd GROUP BY digit)
            SELECT digit, n,
                   CAST(n * 1000000 // (SELECT sum(n) FROM bg)
                        AS BIGINT) AS share_micro
            FROM bg
        """,
        # pipelines/queries.q_conv_response_latency: assistant-after-
        # user response gaps per conversation (sum + count, no float)
        "conv_response_latency": f"""
            WITH rl AS (SELECT conv_id, role, ts,
                               lag(role) OVER w AS prev_role,
                               lag(ts) OVER w AS prev_ts
                        FROM {tr}
                        WINDOW w AS (PARTITION BY conv_id
                                     ORDER BY turn_idx))
            SELECT conv_id,
                   CAST(count(*) FILTER (role = 'assistant'
                        AND prev_role = 'user') AS BIGINT)
                       AS n_responses,
                   CAST(coalesce(sum(epoch_us(ts) - epoch_us(prev_ts))
                        FILTER (role = 'assistant'
                                AND prev_role = 'user'), 0) AS BIGINT)
                       AS sum_gap_us
            FROM rl GROUP BY conv_id
        """,
        # pipelines/queries.q_tool_usage_stats: agent-trace telemetry
        "tool_usage_stats": f"""
            SELECT tool, CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
                   CAST(count(DISTINCT role) AS BIGINT) AS n_roles
            FROM {tr} WHERE tool <> '' GROUP BY tool
        """,
        # pipelines/queries.q_term_association_rules: conversation-
        # granularity market-basket lift between gazetteer terms
        "term_association_rules": f"""
            WITH atoks AS (SELECT conv_id, {tok} AS tokens FROM {tr}),
            apos AS (SELECT conv_id, tokens, unnest(tokens) AS tok,
                            generate_subscripts(tokens, 1) AS p
                     FROM atoks),
            act AS (SELECT DISTINCT conv_id, term FROM (
                        SELECT DISTINCT conv_id, tok AS term
                        FROM apos WHERE tok IN ({gaz}){assoc_multi})),
            atn AS (SELECT term, CAST(count(*) AS BIGINT) AS n
                    FROM act GROUP BY term),
            anc AS (SELECT CAST(count(DISTINCT conv_id) AS BIGINT)
                           AS nc
                    FROM {tr}),
            ab AS (SELECT a.term AS term_a, b.term AS term_b,
                          CAST(count(*) AS BIGINT) AS n_both
                   FROM act a
                   JOIN act b ON a.conv_id = b.conv_id
                             AND a.term < b.term
                   GROUP BY 1, 2)
            SELECT ab.term_a, ab.term_b, ab.n_both, ta.n AS n_a,
                   tb.n AS n_b, anc.nc AS n_convs,
                   CAST(floor(CAST(ab.n_both AS DOUBLE) * anc.nc
                              / (CAST(ta.n AS DOUBLE) * tb.n)
                              * 1e6 + 0.5) AS BIGINT) AS lift_micro
            FROM ab
            JOIN atn ta ON ta.term = ab.term_a
            JOIN atn tb ON tb.term = ab.term_b, anc
        """,
        # pipelines/queries.q_conv_turn_taking: dialog-structure panel
        "conv_turn_taking": f"""
            WITH tt AS (SELECT conv_id, role,
                               lag(role) OVER (PARTITION BY conv_id
                                   ORDER BY turn_idx) AS prev
                        FROM {tr})
            SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(count(*) FILTER (prev IS NOT NULL
                                         AND role <> prev) AS BIGINT)
                       AS n_switches,
                   CAST(count(DISTINCT role) AS BIGINT) AS n_roles
            FROM tt GROUP BY conv_id
        """,
        # pipelines/queries.q_term_trend_daily: mention counts per term
        # per calendar day (single + multi-word spans, same position
        # rules as mention_counts)
        "term_trend_daily": trend_sql,
        # pipelines/queries.q_term_trend_mk: Mann-Kendall S per term
        # over the dense daily mention series (pure integer, dense
        # zero-fill between first and last mention day)
        "term_trend_mk": f"""
            WITH mtd AS MATERIALIZED ({trend_sql}),
            mtb AS (SELECT term, min(day) AS d0, max(day) AS d1
                    FROM mtd GROUP BY term),
            mcal AS (SELECT term,
                            unnest(generate_series(d0, d1,
                                INTERVAL 1 DAY)) AS day
                     FROM mtb),
            mdn AS MATERIALIZED (
                SELECT mcal.term, mcal.day,
                       CAST(coalesce(mtd.n, 0) AS BIGINT) AS n
                FROM mcal LEFT JOIN mtd
                     ON mtd.term = mcal.term AND mtd.day = mcal.day),
            mks AS (SELECT a.term,
                           CAST(sum(CASE WHEN b.n > a.n THEN 1
                                         WHEN b.n < a.n THEN -1
                                         ELSE 0 END) AS BIGINT) AS s
                    FROM mdn a JOIN mdn b
                         ON b.term = a.term AND b.day > a.day
                    GROUP BY a.term),
            mnd AS (SELECT term, CAST(count(*) AS BIGINT) AS n_days
                    FROM mdn GROUP BY term)
            SELECT mnd.term, mnd.n_days,
                   CAST(coalesce(mks.s, 0) AS BIGINT) AS s_stat
            FROM mnd LEFT JOIN mks ON mks.term = mnd.term
        """,
        # pipelines/queries.q_role_token_stats: role verbosity panel
        "role_token_stats": f"""
            SELECT role, CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(coalesce(sum(len({tok})), 0) AS BIGINT)
                       AS n_tokens
            FROM {tr} GROUP BY role
        """,
        "conv_text_digest": f"""
            SELECT conv_id,
                   md5(string_agg(md5(text), '' ORDER BY turn_idx)) AS digest
            FROM {tr} GROUP BY conv_id
        """,
        "orders_by_status": """
            SELECT o_orderstatus, count(*) AS n FROM orders
            GROUP BY o_orderstatus
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS sum_base_cents,
                   CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100
                       + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "top_customers": """
            SELECT c.c_custkey, c.c_name, r.revenue_cents
            FROM (SELECT o_custkey,
                         CAST(sum(CAST(floor(o_totalprice*100 + 0.5)
                             AS BIGINT)) AS BIGINT) AS revenue_cents
                  FROM orders GROUP BY o_custkey) r
            JOIN customer c ON c.c_custkey = r.o_custkey
            ORDER BY r.revenue_cents DESC, c.c_custkey
            LIMIT 10
        """,
        "segment_revenue": """
            SELECT c.c_mktsegment,
                   CAST(sum(CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS revenue_cents,
                   count(*) AS n_orders
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY c.c_mktsegment
        """,
        "events_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*) AS n,
                   CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS sum_value_cents
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "top_orders_per_status": """
            SELECT o_orderstatus, o_orderkey,
                   CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)
                       AS price_cents
            FROM orders
            QUALIFY row_number() OVER (
                PARTITION BY o_orderstatus
                ORDER BY floor(o_totalprice*100 + 0.5) DESC, o_orderkey)
                <= 3
        """,
        "status_distinct_custkeys": """
            SELECT o_orderstatus,
                   count(DISTINCT o_custkey) AS n_custkeys
            FROM orders GROUP BY o_orderstatus
        """,
        "order_price_quantiles": """
            SELECT o_orderstatus,
                   round(quantile_cont(CAST(floor(o_totalprice*100 + 0.5)
                       AS BIGINT), 0.25), 6) AS p25,
                   round(quantile_cont(CAST(floor(o_totalprice*100 + 0.5)
                       AS BIGINT), 0.5), 6) AS p50,
                   round(quantile_cont(CAST(floor(o_totalprice*100 + 0.5)
                       AS BIGINT), 0.75), 6) AS p75
            FROM orders GROUP BY o_orderstatus
        """,
        "order_price_histo": _sql_order_price_histo(),
        # HLL registers (stages/groups.hll_registers): hash =
        # md5_number_upper == first-8-md5-bytes little-endian; bucket =
        # top 8 bits, r = 57 - bit_length of the low 56 (bin() is
        # minimal-length, so length(bin(w)) IS bit_length; w = 0 never
        # survives max() against r >= 1 rows but the CASE keeps it exact)
        "user_hll_registers": """
            WITH b AS (
                SELECT md5_number_upper(CAST(user_id AS VARCHAR)) AS hv
                FROM events
            ), f AS (
                SELECT CAST(hv >> 56 AS BIGINT) AS bucket,
                       hv & CAST(((1::UBIGINT << 56) - 1) AS UBIGINT) AS w
                FROM b
            )
            SELECT bucket,
                   CAST(max(CASE WHEN w = 0 THEN 57
                                 ELSE 57 - length(bin(w)) END)
                        AS BIGINT) AS r
            FROM f GROUP BY bucket
        """,
        "order_price_ntile": """
            SELECT o_orderkey, o_orderstatus,
                   CAST(ntile(4) OVER (PARTITION BY o_orderstatus
                       ORDER BY floor(o_totalprice*100 + 0.5),
                                o_orderkey) AS BIGINT) AS quartile
            FROM orders
        """,
        # grouped HLL: same register math per (event_type, bucket)
        # pipelines/queries.q_event_type_hll_estimate: HLL estimate vs
        # exact distinct (indicator sum in exact HUGEINT scaled 2^57;
        # alpha constant injected from the engine for a bit-identical
        # double literal)
        "event_type_hll_estimate": f"""
            WITH hb AS (SELECT event_type,
                               md5_number_upper(CAST(user_id AS VARCHAR))
                                   AS hv
                        FROM events),
            hf AS (SELECT event_type, CAST(hv >> 56 AS BIGINT) AS bucket,
                          hv & CAST(((1::UBIGINT << 56) - 1) AS UBIGINT)
                              AS w
                   FROM hb),
            hr AS (SELECT event_type, bucket,
                          CAST(max(CASE WHEN w = 0 THEN 57
                                        ELSE 57 - length(bin(w)) END)
                               AS BIGINT) AS r
                   FROM hf GROUP BY event_type, bucket),
            ha AS (SELECT event_type, CAST(count(*) AS BIGINT) AS npres,
                          SUM(CAST(1::UBIGINT << (57 - r) AS HUGEINT))
                              AS s_pres
                   FROM hr GROUP BY event_type),
            hx AS (SELECT event_type,
                          CAST(count(DISTINCT user_id) AS BIGINT)
                              AS n_exact
                   FROM events GROUP BY event_type),
            he AS (SELECT a.event_type, x.n_exact,
                          256 - a.npres AS zeros,
                          ({_HLL_ALPHA_M2!r} * POW(2, 57))
                          / CAST(CAST(256 - a.npres AS HUGEINT)
                                 * CAST(1::UBIGINT << 57 AS HUGEINT)
                                 + a.s_pres AS DOUBLE) AS raw
                   FROM ha a JOIN hx x ON x.event_type = a.event_type),
            hc AS (SELECT event_type, n_exact,
                          CAST(floor(CASE WHEN raw <= 640 AND zeros > 0
                                          THEN 256 * ln(256.0 / zeros)
                                          ELSE raw END + 0.5) AS BIGINT)
                              AS est
                   FROM he)
            SELECT event_type, n_exact, est, abs(est - n_exact) AS err
            FROM hc
        """,
        # pipelines/queries.q_status_gini: exact sorted-rank Gini,
        # HUGEINT sums, one float division rounded to micro-units
        "status_gini": """
            WITH gc AS (SELECT o_orderstatus,
                               CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT) AS cents, o_orderkey
                        FROM orders),
            gr AS (SELECT o_orderstatus, cents,
                          CAST(row_number() OVER (
                              PARTITION BY o_orderstatus
                              ORDER BY cents, o_orderkey) AS HUGEINT)
                              AS rn,
                          CAST(count(*) OVER (
                              PARTITION BY o_orderstatus) AS BIGINT)
                              AS n
                   FROM gc)
            SELECT o_orderstatus, max(n) AS n,
                   CAST(sum(cents) AS BIGINT) AS sum_cents,
                   CAST(floor(
                       CAST(2 * SUM(rn * cents)
                            - CAST(max(n) + 1 AS HUGEINT)
                              * SUM(CAST(cents AS HUGEINT)) AS DOUBLE)
                       / CAST(CAST(max(n) AS HUGEINT)
                              * SUM(CAST(cents AS HUGEINT)) AS DOUBLE)
                       * 1e6 + 0.5) AS BIGINT) AS gini_micro
            FROM gr GROUP BY o_orderstatus
        """,
        "event_type_hll_registers": """
            WITH b AS (
                SELECT event_type,
                       md5_number_upper(CAST(user_id AS VARCHAR)) AS hv
                FROM events
            ), f AS (
                SELECT event_type, CAST(hv >> 56 AS BIGINT) AS bucket,
                       hv & CAST(((1::UBIGINT << 56) - 1) AS UBIGINT) AS w
                FROM b
            )
            SELECT event_type, bucket,
                   CAST(max(CASE WHEN w = 0 THEN 57
                                 ELSE 57 - length(bin(w)) END)
                        AS BIGINT) AS r
            FROM f GROUP BY event_type, bucket
        """,
        # Bloom anti join: a Bloom miss is a definite non-member, so the
        # filter routes rows, never decides membership — mirror is a
        # plain NOT EXISTS
        "segment_customers_without_orders": """
            SELECT c_mktsegment, count(*) AS n_customers
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderstatus = 'O')
            GROUP BY c_mktsegment
        """,
        # the Count-Min sketch only gates the shuffle (never
        # underestimates -> guaranteed candidate superset); the exact
        # second-pass count re-applies the threshold, so the mirror is
        # a plain GROUP BY ... HAVING
        "corpus_heavy_hitters": r"""
            WITH w AS (
                SELECT list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS ws
                FROM documents),
            t AS (SELECT unnest(ws) AS token FROM w)
            SELECT token, count(*) AS n
            FROM t GROUP BY token HAVING count(*) >= 500
        """,
        # the Bloom prefilter only shrinks what the shuffle sees; the
        # exact join removes its false positives, so the mirror is a
        # plain semi join
        "flagged_lineitem_revenue": """
            SELECT l_returnflag,
                   count(*) AS n_items,
                   CAST(sum(CAST(floor(l_extendedprice*100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE o_orderstatus = 'F')
            GROUP BY l_returnflag
        """,
        "events_hopping": _sql_events_hopping(size_min=60, hop_min=30),
        "user_sessions": sessions_sql,
        # pipelines/queries.q_session_length_histogram: rollup of the
        # sessionization output
        "session_length_histogram": f"""
            SELECT n_events AS session_len,
                   CAST(count(*) AS BIGINT) AS n_sessions
            FROM ({sessions_sql}) GROUP BY n_events
        """,
        "doc_token_counts": r"""
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text, '\s+'),
                       w -> w <> '')) AS n_ws_tokens,
                   len(regexp_extract_all(text,
                       '[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]')) AS n_bpe_tokens
            FROM documents
        """,
        # source-layer parity: the engine side reads the JSONL / CSV
        # conversion (sources/textfiles.py); the oracle stays on the
        # parquet view — a hash match proves the ingest path end to end
        "doc_token_counts_jsonl": r"""
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text, '\s+'),
                       w -> w <> '')) AS n_ws_tokens,
                   len(regexp_extract_all(text,
                       '[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]')) AS n_bpe_tokens
            FROM documents
        """,
        # third ingest format: sharded ORC with columnar pruning at the
        # source (sources/textfiles.read_documents_orc)
        "doc_token_counts_orc": r"""
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text, '\s+'),
                       w -> w <> '')) AS n_ws_tokens,
                   len(regexp_extract_all(text,
                       '[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]')) AS n_bpe_tokens
            FROM documents
        """,
        "doc_quality_csv": _sql_doc_quality(stop),
        "doc_quality": _sql_doc_quality(stop),
        # pipelines/queries.q_source_quality_rollup: per-source C4-pass
        # dashboard (same thresholds as doc_quality_filter)
        "source_quality_rollup": f"""
            WITH sq AS (SELECT d.source, q.n_chars, q.alpha_ratio,
                               q.stop_ratio
                        FROM ({_sql_doc_quality(stop)}) q
                        JOIN documents d ON d.doc_id = q.doc_id),
            sg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                          CAST(count(*) FILTER (n_chars >= 80
                                   AND alpha_ratio >= 0.6
                                   AND stop_ratio <= 0.5) AS BIGINT)
                              AS n_pass
                   FROM sq GROUP BY source)
            SELECT source, n_docs, n_pass,
                   n_pass * 1000000 // n_docs AS pass_micro
            FROM sg
        """,
        # pipelines/queries.q_embedding_dim_stats: per-dimension micro-
        # unit sum/min/max/count (0-based dims, pca quantisation rule)
        "embedding_dim_stats": """
            WITH eq AS (SELECT generate_subscripts(embedding, 1) - 1
                               AS dim,
                               CAST(floor(CAST(unnest(embedding)
                                               AS DOUBLE) * 1000000
                                          + 0.5) AS BIGINT) AS q
                        FROM embeddings)
            SELECT CAST(dim AS BIGINT) AS dim,
                   CAST(sum(q) AS BIGINT) AS sum_micro,
                   min(q) AS min_micro, max(q) AS max_micro,
                   CAST(count(*) AS BIGINT) AS n
            FROM eq GROUP BY dim
        """,
        # C4-style filter over the same quality signals (thresholds are
        # the engine's quality_filter_batch defaults)
        "doc_quality_filter": f"""
            SELECT doc_id, n_chars FROM ({_sql_doc_quality(stop)})
            WHERE n_chars >= 80 AND alpha_ratio >= 0.6
              AND stop_ratio <= 0.5
        """,
        # deterministic md5-bucket train/val split, aggregated
        "doc_split_counts": """
            SELECT split, count(*) AS n FROM (
                SELECT CASE WHEN md5_number_upper(CAST(doc_id AS VARCHAR))
                                 % 100 < 95
                            THEN 'train' ELSE 'val' END AS split
                FROM documents) GROUP BY split
        """,
        "doc_fingerprint": f"""
            SELECT doc_id,
                   md5(array_to_string({tok}, ' ')) AS fingerprint
            FROM documents
        """,
        # pipelines/queries.q_corpus_shard_manifest: per-shard content
        # checksum (md5 of doc fingerprints in doc_id order) + masses
        "corpus_shard_manifest": f"""
            WITH d AS (SELECT doc_id, doc_id % 16 AS shard,
                              md5(array_to_string({tok}, ' ')) AS fp,
                              len(list_filter(regexp_split_to_array(
                                  text, '\\s+'), x -> x <> ''))
                                  AS n_ws
                       FROM documents)
            SELECT CAST(shard AS BIGINT) AS shard,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_ws) AS BIGINT) AS n_tokens,
                   md5(string_agg(fp, '' ORDER BY doc_id)) AS checksum
            FROM d GROUP BY shard
        """,
        # pipelines/queries.q_doc_weighted_sample_topk: RNG-free
        # Efraimidis-Spirakis weighted sample (key ln(u)/w, nano units)
        "doc_weighted_sample_topk": r"""
            WITH k AS (SELECT doc_id, n_chars,
                CAST(floor(ln((CAST(md5_number_upper(
                        CAST(doc_id AS VARCHAR)) >> 11 AS DOUBLE) + 0.5)
                        / 9007199254740992.0)
                    / n_chars * 1000000000 + 0.5) AS BIGINT)
                    AS lnkey_nano
                FROM documents),
            r AS (SELECT *, row_number() OVER (
                      ORDER BY lnkey_nano DESC, doc_id) AS rnk
                  FROM k)
            SELECT doc_id, n_chars, lnkey_nano,
                   CAST(rnk AS BIGINT) AS rnk
            FROM r WHERE rnk <= 64
        """,
        # pipelines/queries.q_corpus_f2_sketch: AMS 1996 second-moment
        # sketch audited vs exact F2 (integer sketch, one float err op)
        "corpus_f2_sketch": r"""
            WITH w AS (SELECT unnest(list_filter(
                           regexp_split_to_array(text, '\s+'),
                           x -> x <> '')) AS tok FROM documents),
            tokc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
                     FROM w GROUP BY tok),
            rws AS (SELECT unnest(range(5)) AS r),
            h AS (SELECT rws.r, tokc.c,
                         md5_number_upper(CAST(rws.r AS VARCHAR)
                             || ':' || tokc.tok) AS hh
                  FROM tokc CROSS JOIN rws),
            cnt AS (SELECT r, hh % 64 AS b,
                           CAST(sum(CASE WHEN (hh // 64) % 2 = 0
                                    THEN c ELSE -c END) AS BIGINT)
                               AS ctr
                    FROM h GROUP BY 1, 2),
            est AS (SELECT r, CAST(sum(ctr * ctr) AS BIGINT) AS f2_est
                    FROM cnt GROUP BY r),
            ex AS (SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact
                   FROM tokc)
            SELECT CAST(est.r AS BIGINT) AS sketch_row, est.f2_est,
                   ex.f2_exact,
                   CAST(floor(abs(est.f2_est - ex.f2_exact)
                        / CAST(ex.f2_exact AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT) AS err_micro
            FROM est CROSS JOIN ex
        """,
        # pipelines/queries.q_doc_blocklist_hits: C4-family blocklist
        # drop list with hit counts (fixed shared blocklist)
        "doc_blocklist_hits": r"""
            WITH w AS (SELECT doc_id,
                       unnest(list_filter(
                           regexp_split_to_array(text, '\s+'),
                           x -> x <> '')) AS tok FROM documents)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
            FROM w WHERE tok IN ('boiler', 'dup', 'spam')
            GROUP BY doc_id
        """,
        # pipelines/queries.q_source_neardup_matrix: verified near-dup
        # pairs rolled up by unordered source pair
        "source_neardup_matrix": f"""
            WITH p AS (SELECT doc_a, doc_b
                       FROM ({_sql_jaccard_pairs(tok)}))
            SELECT least(da.source, db.source) AS src_a,
                   greatest(da.source, db.source) AS src_b,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM p JOIN documents da ON da.doc_id = p.doc_a
                   JOIN documents db ON db.doc_id = p.doc_b
            GROUP BY 1, 2
        """,
        # Gopher-style repetition signals: distinct-token ratio + fraction
        # of bigram positions covered by the most frequent word bigram
        # (mirror of stages/textstats.repetition_batch)
        "doc_repetition": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS ws
                FROM documents),
            base AS (
                SELECT doc_id, len(ws) AS n,
                       len(list_distinct(ws)) AS d, ws
                FROM w),
            bg AS (
                SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
                FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
                      FROM base WHERE n >= 2)),
            bgc AS (SELECT doc_id, w1, w2, count(*) AS c
                    FROM bg GROUP BY ALL),
            mx AS (SELECT doc_id, max(c) AS mc FROM bgc GROUP BY doc_id)
            SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens,
                floor(CASE WHEN b.n > 0 THEN CAST(b.d AS DOUBLE) / b.n
                      ELSE 0 END * 1000000 + 0.5) / 1000000.0
                    AS distinct_ratio,
                floor(CASE WHEN b.n >= 2
                      THEN CAST(coalesce(mx.mc, 0) AS DOUBLE) / (b.n - 1)
                      ELSE 0 END * 1000000 + 0.5) / 1000000.0
                    AS top_bigram_frac
            FROM base b LEFT JOIN mx USING (doc_id)
        """,
        # deterministic per-language stratified hash sample (mirror of
        # stages/textstats.stratified_sample_batch)
        "doc_stratified_sample": _sql_stratified_sample(),
        # PII redaction over deterministic planted spans (stages/pii.py)
        "doc_pii_redact": _sql_pii_redact(),
        # MassiveText-style duplicated-n-gram fraction (dedup.py)
        "doc_dup_ngrams": _sql_dup_ngram_stats(tok),
        # pipelines/queries.q_source_gram_overlap: distinct shared
        # 5-gram hashes per source pair (cross-feed contamination)
        "source_gram_overlap": f"""
            WITH ggs AS (SELECT DISTINCT gr.g, d.source
                         FROM ({_sql_grams(tok, 5)}) gr
                         JOIN documents d USING (doc_id))
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM ggs a JOIN ggs b ON a.g = b.g AND a.source < b.source
            GROUP BY 1, 2
        """,
        # pipelines/queries.q_user_first_last_events: per-user first and
        # last event in (ts, event_id) order + count
        "user_first_last_events": """
            WITH fr AS (SELECT user_id, event_id, event_type,
                               row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS rka,
                               row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC)
                                   AS rkd,
                               CAST(count(*) OVER (PARTITION BY user_id)
                                    AS BIGINT) AS n
                        FROM events)
            SELECT f.user_id, f.event_id AS first_event_id,
                   f.event_type AS first_type,
                   l.event_id AS last_event_id,
                   l.event_type AS last_type, f.n
            FROM (SELECT * FROM fr WHERE rka = 1) f
            JOIN (SELECT * FROM fr WHERE rkd = 1) l USING (user_id)
        """,
        # dedup.dedup_spans: Lee-et-al-style duplicate-span removal
        "doc_dedup_spans": _sql_dedup_spans(tok),
        "doc_exact_substrings": _sql_exact_substrings(tok),
        # composed chain v2: span removal x language rollup
        "doc_pipeline_spans_summary": f"""
            SELECT d.lang, l.lang_pred,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN s.n_removed > 0 THEN 1 ELSE 0
                            END) AS BIGINT) AS n_docs_touched,
                   CAST(SUM(s.n_tokens) AS BIGINT) AS sum_tokens,
                   CAST(SUM(s.n_removed) AS BIGINT) AS sum_removed
            FROM ({_sql_dedup_spans(tok)}) s
            JOIN ({_sql_doc_langid()}) l USING (doc_id)
            JOIN documents d USING (doc_id)
            GROUP BY d.lang, l.lang_pred
        """,
        # URL domain counts over planted URLs (stages/pii.py)
        "doc_url_domains": r"""
            WITH planted AS (
                SELECT doc_id,
                       text || ' see https://site'
                            || CAST(doc_id % 7 AS VARCHAR)
                            || '.example.com/page/'
                            || CAST(doc_id AS VARCHAR)
                            || ' and http://cdn'
                            || CAST(doc_id % 3 AS VARCHAR)
                            || '.example.org/x' AS ptext
                FROM documents),
            hosts AS (
                SELECT unnest(regexp_extract_all(ptext,
                       'https?://([A-Za-z0-9.\-]+)', 1)) AS domain
                FROM planted)
            SELECT domain, CAST(count(*) AS BIGINT) AS n
            FROM hosts GROUP BY domain
        """,
        # composed curation chain: filter -> langid -> exact dedup ->
        # split -> summary (mirror of queries.q_doc_pipeline_summary;
        # each CTE is the already-proven per-stage mirror, joined on
        # doc_id, dedup first-wins over the KEPT set only)
        "doc_pipeline_summary": f"""
            WITH kept AS (
                SELECT doc_id, n_chars FROM ({_sql_doc_quality(stop)})
                WHERE n_chars >= 80 AND alpha_ratio >= 0.6
                  AND stop_ratio <= 0.5),
            lang AS (SELECT doc_id, lang_pred FROM ({_sql_doc_langid()})),
            fp AS (SELECT doc_id,
                          md5(array_to_string({tok}, ' ')) AS fingerprint
                   FROM documents),
            dedup AS (
                SELECT doc_id FROM (
                    SELECT k.doc_id,
                           row_number() OVER (PARTITION BY f.fingerprint
                                              ORDER BY k.doc_id) AS rn
                    FROM kept k JOIN fp f USING (doc_id))
                WHERE rn = 1),
            final AS (
                SELECT l.lang_pred,
                       CASE WHEN md5_number_upper(CAST(d.doc_id
                                AS VARCHAR)) % 100 < 95
                            THEN 'train' ELSE 'val' END AS split,
                       k.n_chars
                FROM dedup d JOIN lang l USING (doc_id)
                JOIN kept k USING (doc_id))
            SELECT lang_pred, split,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM final GROUP BY lang_pred, split
        """,
        # benchmark decontamination via shared k-grams (dedup.py)
        "doc_decontaminate": _sql_decontaminate(tok),
        # greedy next-fit sequence packing per lang (stages/packing.py)
        "doc_pack_sequences": _sql_pack_sequences(),
        # pipelines/queries.q_pack_efficiency: per-lang fill-rate
        # rollup of the packing assignment
        "pack_efficiency": f"""
            WITH pk AS ({_sql_pack_sequences()})
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(max(pack_id) + 1 AS BIGINT) AS n_packs,
                   CAST(sum(nt) AS BIGINT) AS n_tokens,
                   CAST(sum(nt) * 1000000
                        // ((max(pack_id) + 1) * 256) AS BIGINT)
                       AS fill_micro
            FROM pk GROUP BY lang
        """,
        # distributed k-means, integer-exact Lloyd rounds (kmeans.py)
        "kmeans_clusters": _sql_kmeans(),
        # stages/kmeans.pq_codes: product quantization — one unrolled
        # Lloyd mirror per 16-dim list_slice subspace, UNION ALL
        "embedding_pq_codes": " UNION ALL ".join(
            f"SELECT vec_id, CAST({s} AS BIGINT) AS subspace, "
            f"cluster AS code, dist FROM ({_sql_kmeans(4, 3, 16, f'list_slice(embedding, {s * 16 + 1}, {(s + 1) * 16})')})"
            for s in range(4)),
        # stages/kmeans.pq_adc_topk: PQ asymmetric-distance top-k over
        # the same subspace codebooks (LUT scoring, exact int64)
        "pq_adc_topk": _sql_pq_adc_topk(),
        # SemDeDup: within-cluster near-identical drops (kmeans.py)
        "semdedup_drops": _sql_semdedup(),
        # add-one-smoothed corpus bigram LM scores; per-term int64
        # micro-unit scaling makes the per-doc sum order-independent
        # (mirror of stages/lm.bigram_lm_scores)
        "bigram_lm_score": _sql_bigram_lm(),
        # pipelines/queries.q_doc_ppl_buckets: CCNet-style per-language
        # head/middle/tail tertiles of the LM score (Wenzek 2020) —
        # NTILE over the int64 micro-unit score, doc_id tie-break
        "doc_ppl_buckets": f"""
            WITH lm AS ({_sql_bigram_lm()}),
            j AS (SELECT lm.doc_id, d.lang,
                         CAST(floor(lm.lm_score * 1000000 + 0.5)
                              AS BIGINT) AS lm_micro
                  FROM lm JOIN documents d USING (doc_id)),
            t AS (SELECT doc_id, lang,
                         CAST(ntile(3) OVER (PARTITION BY lang
                              ORDER BY lm_micro, doc_id) AS BIGINT)
                             AS ppl_tertile
                  FROM j)
            SELECT doc_id, lang, ppl_tertile,
                   CASE ppl_tertile WHEN 1 THEN 'tail'
                        WHEN 2 THEN 'middle' ELSE 'head' END AS bucket
            FROM t
        """,
        # pipelines/queries.q_doc_winnowing: Schleimer 2003 winnowing
        # (w=4 windows over 3-gram 63-bit hashes, rightmost-min ties)
        # via the window decomposition: pos selected iff for some split
        # a the previous a hashes are >= h and the next 3-a are > h,
        # window fully inside the doc
        "doc_winnowing": winnow_sql,
        # doc pairs sharing >= 2 winnowing fingerprints (posting cap
        # 1000 shared with the engine)
        "winnow_overlap_pairs": f"""
            WITH fp0 AS ({winnow_sql}),
            d AS (SELECT DISTINCT doc_id, fp FROM fp0),
            keep AS (SELECT fp FROM d GROUP BY fp
                     HAVING count(*) BETWEEN 2 AND 1000),
            p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM d a JOIN d b ON b.fp = a.fp
                                   AND b.doc_id > a.doc_id
                  WHERE a.fp IN (SELECT fp FROM keep))
            SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_shared
            FROM p GROUP BY doc_a, doc_b HAVING count(*) >= 2
        """,
        # containment over the smaller fingerprint set per pair
        "winnow_containment": f"""
            WITH fp0 AS ({winnow_sql}),
            d AS (SELECT DISTINCT doc_id, fp FROM fp0),
            nfp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nfp
                    FROM d GROUP BY doc_id),
            keep AS (SELECT fp FROM d GROUP BY fp
                     HAVING count(*) BETWEEN 2 AND 1000),
            p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM d a JOIN d b ON b.fp = a.fp
                                   AND b.doc_id > a.doc_id
                  WHERE a.fp IN (SELECT fp FROM keep)),
            pr AS (SELECT doc_a, doc_b,
                          CAST(count(*) AS BIGINT) AS n_shared
                   FROM p GROUP BY doc_a, doc_b HAVING count(*) >= 2)
            SELECT pr.doc_a, pr.doc_b, pr.n_shared,
                   CAST(floor(pr.n_shared
                        / CAST(least(na.nfp, nb.nfp) AS DOUBLE)
                        * 1000000 + 0.5) AS BIGINT)
                       AS containment_micro
            FROM pr JOIN nfp na ON na.doc_id = pr.doc_a
                    JOIN nfp nb ON nb.doc_id = pr.doc_b
        """,
        # pipelines/queries.q_source_distinct_ngrams: distinct-1/2/3
        # lexical diversity per source (Li 2016)
        "source_distinct_ngrams": r"""
            WITH w AS (SELECT source,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS ws FROM documents),
            g1 AS (SELECT source, unnest(ws) AS gram, 1 AS n FROM w),
            g2 AS (SELECT source, ws[i] || ' ' || ws[i + 1] AS gram,
                          2 AS n
                   FROM (SELECT source, ws,
                                unnest(range(1, len(ws))) AS i
                         FROM w WHERE len(ws) >= 2)),
            g3 AS (SELECT source,
                          ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]
                              AS gram, 3 AS n
                   FROM (SELECT source, ws,
                                unnest(range(1, len(ws) - 1)) AS i
                         FROM w WHERE len(ws) >= 3)),
            g AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2
                  UNION ALL SELECT * FROM g3)
            SELECT source, CAST(n AS BIGINT) AS n,
                   CAST(count(DISTINCT gram) AS BIGINT)
                       AS distinct_ngrams,
                   CAST(count(*) AS BIGINT) AS total_ngrams,
                   CAST(floor(count(DISTINCT gram)
                        / CAST(count(*) AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT) AS ratio_micro
            FROM g GROUP BY source, n
        """,
        # pipelines/queries.q_source_keyness_topk: top-10 characteristic
        # tokens per source by +1-smoothed log-odds vs rest of corpus
        # (Monroe 2008 family); micro-quantised delta fixes rank order
        "source_keyness_topk": r"""
            WITH w AS (SELECT source,
                       unnest(list_filter(
                           regexp_split_to_array(text, '\s+'),
                           x -> x <> '')) AS tok FROM documents),
            st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
                   FROM w GROUP BY ALL),
            ct AS (SELECT tok, CAST(sum(c) AS BIGINT) AS cw
                   FROM st GROUP BY tok),
            ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens
                   FROM st GROUP BY source),
            n AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM st),
            d AS (SELECT st.source, st.tok AS token, st.c,
                         CAST(floor((ln((st.c + 1.0)
                                  / (ns.n_tokens - st.c + 1.0))
                              - ln((ct.cw - st.c + 1.0)
                                  / (n.nn - ns.n_tokens
                                     - (ct.cw - st.c) + 1.0)))
                              * 1000000 + 0.5) AS BIGINT)
                             AS delta_micro
                  FROM st JOIN ct USING (tok) JOIN ns USING (source)
                  CROSS JOIN n),
            r AS (SELECT *, row_number() OVER (PARTITION BY source
                       ORDER BY delta_micro DESC, token) AS rnk
                  FROM d)
            SELECT source, token, c, delta_micro,
                   CAST(rnk AS BIGINT) AS rnk
            FROM r WHERE rnk <= 10
        """,
        # pipelines/queries.q_source_unigram_kl: per-source domain-shift
        # KL(P_s || P_corpus) in integer micro-nats — per-term micro
        # quantised c*ln(c*N/(N_s*c_w)), exact integer sums, one float
        # division at the end (same contract as bigram_lm_score)
        "source_unigram_kl": r"""
            WITH w AS (SELECT source,
                       unnest(list_filter(
                           regexp_split_to_array(text, '\s+'),
                           x -> x <> '')) AS tok FROM documents),
            st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
                   FROM w GROUP BY ALL),
            ct AS (SELECT tok, CAST(sum(c) AS BIGINT) AS cw
                   FROM st GROUP BY tok),
            ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens
                   FROM st GROUP BY source),
            n AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM st),
            terms AS (
                SELECT st.source,
                       CAST(floor(st.c * ln(
                            (CAST(st.c AS DOUBLE) * n.nn)
                            / (CAST(ns.n_tokens AS DOUBLE) * ct.cw))
                            * 1000000 + 0.5) AS BIGINT) AS sc
                FROM st JOIN ct USING (tok) JOIN ns USING (source)
                CROSS JOIN n)
            SELECT ns.source, ns.n_tokens,
                   CAST(floor((CAST(sum(sc) AS DOUBLE) / 1000000.0)
                        / ns.n_tokens * 1000000 + 0.5) AS BIGINT)
                       AS kl_micro
            FROM terms JOIN ns USING (source)
            GROUP BY ns.source, ns.n_tokens
        """,
        # pipelines/queries._mixture_rates: temperature-based mixture
        # resampling (q_s ∝ sqrt(n_s), budget = half the corpus tokens);
        # exact-integer rate contract — sqrt is IEEE correctly rounded,
        # everything after the half-up micro quantisation is HUGEINT
        "mixture_plan": r"""
            WITH w AS (SELECT source,
                       len(list_filter(regexp_split_to_array(text, '\s+'),
                           x -> x <> '')) AS n FROM documents),
            src AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens
                    FROM w GROUP BY source),
            tot AS (SELECT CAST(sum(n_tokens) AS HUGEINT) AS t FROM src),
            s AS (SELECT source, n_tokens,
                         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))
                              * 1000000 + 0.5) AS BIGINT) AS s_micro
                  FROM src),
            ss AS (SELECT CAST(sum(s_micro) AS HUGEINT) AS ssum FROM s)
            SELECT source, n_tokens, s_micro,
                   CAST(least(CAST(1000000 AS HUGEINT),
                        ((tot.t * 1 // 2) * s_micro * 1000000)
                         // (ss.ssum * n_tokens)) AS BIGINT) AS rate_micro
            FROM s CROSS JOIN ss CROSS JOIN tot
        """,
        "doc_mixture_resample": r"""
            WITH w AS (SELECT source,
                       len(list_filter(regexp_split_to_array(text, '\s+'),
                           x -> x <> '')) AS n FROM documents),
            src AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens
                    FROM w GROUP BY source),
            tot AS (SELECT CAST(sum(n_tokens) AS HUGEINT) AS t FROM src),
            s AS (SELECT source, n_tokens,
                         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))
                              * 1000000 + 0.5) AS BIGINT) AS s_micro
                  FROM src),
            ss AS (SELECT CAST(sum(s_micro) AS HUGEINT) AS ssum FROM s),
            r AS (SELECT source,
                         CAST(least(CAST(1000000 AS HUGEINT),
                              ((tot.t * 1 // 2) * s_micro * 1000000)
                               // (ss.ssum * n_tokens)) AS BIGINT)
                             AS rate_micro
                  FROM s CROSS JOIN ss CROSS JOIN tot)
            SELECT d.doc_id, d.source, r.rate_micro
            FROM documents d JOIN r USING (source)
            WHERE md5_number_upper(CAST(d.doc_id AS VARCHAR))
                  % 1000000 < r.rate_micro
        """,
        # DSIR-style importance sampling over the LM score (stages/lm.py)
        "doc_importance_sample": f"""
            SELECT doc_id, lm_score, rate FROM (
                SELECT doc_id, lm_score,
                       CAST(least(95, greatest(5,
                            floor((lm_score + 4) * 100 + 0.5)))
                            AS BIGINT) AS rate
                FROM ({_sql_bigram_lm()}))
            WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 < rate
        """,
        # top-5 tf-idf tokens per doc, smooth sklearn-style idf; rank
        # ties (score DESC, token ASC) — mirror of stages/lm.tfidf_topk
        # lm.tfidf_pair_sim: inverted-index all-pairs cosine over the
        # top-5 tf-idf vectors, milli-unit integer dot/norms, one float
        # op for cos6; posting lists over 1000 docs skipped (shared cap)
        "doc_tfidf_pair_sim": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS ws
                FROM documents),
            tfs AS (SELECT doc_id, unnest(ws) AS tok FROM w),
            tf AS (SELECT doc_id, tok, count(*) AS c
                   FROM tfs GROUP BY ALL),
            df AS (SELECT tok, count(DISTINCT doc_id) AS df
                   FROM tfs GROUP BY tok),
            n AS (SELECT count(*) AS n FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.tok AS token,
                       floor(tf.c * (ln((1.0 + n.n) / (1.0 + df.df))
                             + 1.0) * 1000000 + 0.5) / 1000000.0 AS score
                FROM tf JOIN df USING (tok) CROSS JOIN n),
            v AS MATERIALIZED (
                SELECT doc_id, token,
                       CAST(floor(score * 1000 + 0.5) AS BIGINT) AS s
                FROM (SELECT doc_id, token, score,
                             row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, token ASC) AS rank
                      FROM scored)
                WHERE rank <= 5),
            keep AS (SELECT token FROM v GROUP BY token
                     HAVING count(*) BETWEEN 2 AND 1000),
            p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                         a.s * b.s AS prod
                  FROM v a JOIN v b ON b.token = a.token
                                   AND b.doc_id > a.doc_id
                  WHERE a.token IN (SELECT token FROM keep)),
            d AS (SELECT doc_a, doc_b,
                         CAST(SUM(prod) AS BIGINT) AS dot,
                         CAST(count(*) AS BIGINT) AS shared
                  FROM p GROUP BY doc_a, doc_b),
            nrm AS (SELECT doc_id, CAST(SUM(s * s) AS BIGINT) AS n2
                    FROM v GROUP BY doc_id)
            SELECT d.doc_a, d.doc_b, d.shared, d.dot,
                   na.n2 AS na2, nb.n2 AS nb2,
                   floor(CAST(d.dot AS DOUBLE)
                         / sqrt(CAST(na.n2 AS DOUBLE)
                                * CAST(nb.n2 AS DOUBLE))
                         * 1e6 + 0.5) / 1e6 AS cos6
            FROM d JOIN nrm na ON na.doc_id = d.doc_a
                   JOIN nrm nb ON nb.doc_id = d.doc_b
        """,
        "doc_tfidf_topk": tfidf_sql,
        # pipelines/queries.q_doc_tfidf_novelty: per-doc mean top-term
        # tf-idf in micro-units (truncating mean of exact micro ints)
        "doc_tfidf_novelty": f"""
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
                   CAST(sum(CAST(floor(score * 1e6 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_score_micro,
                   CAST(sum(CAST(floor(score * 1e6 + 0.5) AS BIGINT))
                        // count(*) AS BIGINT) AS mean_score_micro
            FROM ({tfidf_sql}) GROUP BY doc_id
        """,
        # as-of join: each event -> the user's most recent prior order;
        # greatest o_orderdate <= ts, ties to the greatest o_orderkey
        # (mirror of stages/joins.asof_join backward semantics)
        # partitioned window function (mirror of
        # analytics.customer_running_total: exact integer cents, orderkey
        # tie-break makes the cumulative frame deterministic)
        "customer_running_total": """
            WITH c AS (
                SELECT o_orderkey, o_custkey, o_orderdate,
                       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                           AS cents
                FROM orders)
            SELECT o_orderkey, o_custkey,
                   CAST(row_number() OVER win AS BIGINT) AS rn,
                   CAST(SUM(cents) OVER win AS BIGINT) AS cum_cents
            FROM c
            WINDOW win AS (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey)
        """,
        # pivot / conditional aggregation (mirror of
        # analytics.user_event_pivot; the engine discovers the column set
        # with a distributed distinct — the mirror enumerates the same
        # sorted set)
        "user_event_pivot": _sql_user_event_pivot(),
        # ROLLUP aggregate (mirror of analytics.events_rollup: one scan,
        # coarser levels derived; lvl = the GROUPING bitmask)
        "events_rollup": """
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   CAST(GROUPING(event_type, date_trunc('day', ts))
                        AS BIGINT) AS lvl
            FROM events
            GROUP BY ROLLUP(event_type, date_trunc('day', ts))
        """,
        # range (interval) self-join (mirror of
        # analytics.event_recent_activity: same user's other events in the
        # trailing 6 hours, exact integer cents)
        "event_recent_activity": """
            SELECT e.event_id,
                   CAST(count(*) AS BIGINT) AS n_recent,
                   CAST(SUM(CAST(floor(o.value * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS sum_cents
            FROM events e JOIN events o
              ON o.user_id = e.user_id
             AND o.ts <= e.ts
             AND o.ts >= e.ts - INTERVAL 360 MINUTE
             AND o.event_id <> e.event_id
            GROUP BY e.event_id
        """,
        "asof_user_order": """
            SELECT event_id, o_orderkey, o_totalprice FROM (
                SELECT e.event_id, o.o_orderkey, o.o_totalprice,
                       row_number() OVER (PARTITION BY e.event_id
                           ORDER BY o.o_orderdate DESC,
                                    o.o_orderkey DESC) AS rn
                FROM events e JOIN orders o
                  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            ) WHERE rn = 1
        """,
        # JSON-ish field extraction (RE2) + per-type aggregate; avg from
        # exact integer partials (mirror of analytics.event_props_k_stats)
        "event_props_k_stats": """
            WITH x AS (
                SELECT event_type,
                       CAST(regexp_extract(props, '"k": ([0-9]+)', 1)
                            AS BIGINT) AS k
                FROM events)
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   CAST(max(k) AS BIGINT) AS max_k,
                   floor(CAST(sum(k) AS DOUBLE) / count(*) * 1000000
                         + 0.5) / 1000000.0 AS avg_k
            FROM x GROUP BY event_type
        """,
        # text -> actor-pool embed -> exact cosine near-dup, checked end
        # to end; the checkpointed twin resumes the inference pass from
        # per-shard manifests (pipelines/embed_ckpt.py) and must produce
        # the identical pair list
        "doc_embed_near_dup": embed_neardup_sql,
        "doc_embed_near_dup_checkpointed": embed_neardup_sql,
        "embedding_near_dup": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 6) AS score
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))
                  > 0.4
        """,
        "knn_cosine_topk": _SQL_KNN_EXACT,
        "knn_self_topk": _SQL_KNN_SELF,
        # pipelines/mlstats.event_type_markov_stationary: 8 unrolled
        # integer power rounds over the transition counts
        "event_type_markov_stationary": _sql_markov_stationary(),
        # pipelines/mlstats.user_negative_types: catalog anti join per
        # user — never-interacted types, ordered string_agg list
        "user_negative_types": """
            WITH used AS (SELECT DISTINCT user_id, event_type
                          FROM events),
            cat AS (SELECT DISTINCT event_type FROM events),
            neg AS (SELECT u.user_id, c.event_type
                    FROM (SELECT DISTINCT user_id FROM used) u
                    CROSS JOIN cat c
                    LEFT JOIN used x ON x.user_id = u.user_id
                                    AND x.event_type = c.event_type
                    WHERE x.user_id IS NULL)
            SELECT u.user_id,
                   CAST(count(DISTINCT used.event_type) AS BIGINT)
                       AS n_used,
                   CAST(coalesce(n.n_neg, 0) AS BIGINT) AS n_neg,
                   coalesce(n.negatives, '') AS negatives
            FROM (SELECT DISTINCT user_id FROM used) u
            JOIN used ON used.user_id = u.user_id
            LEFT JOIN (SELECT user_id,
                              count(*) AS n_neg,
                              string_agg(event_type, ','
                                         ORDER BY event_type)
                                  AS negatives
                       FROM neg GROUP BY user_id) n
              ON n.user_id = u.user_id
            GROUP BY u.user_id, n.n_neg, n.negatives
        """,
        # pipelines/sequences.user_rolling_median7: interpolated median
        # over a trailing 7-ROW frame of the dense series (dense days
        # make ROWS == RANGE; ints or dyadic halves — exact float64)
        "user_rolling_median7": f"""
            WITH rmd AS ({dense_sql})
            SELECT user_id, day, n_events,
                   median(n_events) OVER (
                       PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                       AS med7
            FROM rmd
        """,
        # pipelines/mlstats.event_type_cosine: item-item cosine from
        # exact HUGEINT dot/norm sums, one float chain at 6 dp
        "event_type_cosine": """
            WITH c AS (SELECT user_id, event_type,
                              CAST(count(*) AS BIGINT) AS c
                       FROM events GROUP BY ALL),
            p AS (SELECT a.event_type AS t1, b.event_type AS t2,
                         CAST(SUM(CAST(a.c AS HUGEINT) * b.c)
                              AS BIGINT) AS dot
                  FROM c a JOIN c b ON a.user_id = b.user_id
                                   AND a.event_type < b.event_type
                  GROUP BY t1, t2),
            n AS (SELECT event_type,
                         CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT)
                             AS n2
                  FROM c GROUP BY event_type)
            SELECT p.t1, p.t2, p.dot,
                   floor(CAST(p.dot AS DOUBLE)
                         / (sqrt(CAST(na.n2 AS DOUBLE))
                            * sqrt(CAST(nb.n2 AS DOUBLE)))
                         * 1e6 + 0.5) / 1e6 AS cos6
            FROM p
            JOIN n na ON na.event_type = p.t1
            JOIN n nb ON nb.event_type = p.t2
        """,
        # pipelines/mlstats.doc_hash_shard_balance: md5-contract shard
        # counts + signed truncating micro deviation from uniform
        "doc_hash_shard_balance": """
            WITH s AS (SELECT CAST(md5_number_upper(
                                   CAST(doc_id AS VARCHAR)) % 64
                                   AS BIGINT) AS shard
                       FROM documents),
            c AS (SELECT shard, CAST(count(*) AS BIGINT) AS n
                  FROM s GROUP BY shard),
            t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c)
            SELECT c.shard, c.n,
                   (c.n * 64 - t.nt) * 1000000 // t.nt AS dev_micro
            FROM c, t
        """,
        # stages/groups.kmv_registers: k smallest distinct 63-bit md5
        # hashes (md5_number_upper >> 1, the shared contract)
        "user_kmv_registers": """
            WITH h AS (SELECT DISTINCT
                              CAST(md5_number_upper(
                                   CAST(user_id AS VARCHAR)) >> 1
                                   AS BIGINT) AS h63
                       FROM events),
            r AS (SELECT h63, row_number() OVER (ORDER BY h63) AS rk
                  FROM h)
            SELECT CAST(rk AS BIGINT) AS rank, h63
            FROM r WHERE rk <= 32
        """,
        # stages/groups.kmv_estimate: (k-1)·2^63 // h_k integer
        # estimator (exact count when the sketch is under-full) +
        # truncating signed micro error vs the exact distinct
        "user_kmv_estimate": """
            WITH h AS (SELECT DISTINCT
                              CAST(md5_number_upper(
                                   CAST(user_id AS VARCHAR)) >> 1
                                   AS BIGINT) AS h63
                       FROM events),
            sk AS (SELECT h63 FROM h ORDER BY h63 LIMIT 32),
            kth AS (SELECT CAST(max(h63) AS HUGEINT) AS hk,
                           CAST(count(*) AS BIGINT) AS k FROM sk),
            ex AS (SELECT CAST(count(*) AS BIGINT) AS n FROM h),
            e AS (SELECT kth.k, ex.n,
                         CASE WHEN kth.k < 32 THEN kth.k
                              ELSE CAST((CAST(kth.k AS HUGEINT) - 1)
                                        * 9223372036854775808 // kth.hk
                                        AS BIGINT) END AS est
                  FROM kth, ex)
            SELECT k, n AS n_distinct, est,
                   (est - n) * 1000000 // n AS err_micro
            FROM e
        """,
        # pipelines/mlstats.user_inactivity_churn: per-user last active
        # day + exact inactivity vs corpus max, >7-day churn flag
        "user_inactivity_churn": """
            WITH u AS (SELECT user_id,
                              CAST(max(epoch_us(ts) // 86400000000)
                                   AS BIGINT) AS last_day
                       FROM events GROUP BY user_id)
            SELECT user_id, last_day,
                   CAST((SELECT max(last_day) FROM u) - last_day
                        AS BIGINT) AS days_inactive,
                   CAST(CASE WHEN (SELECT max(last_day) FROM u)
                                  - last_day > 7
                             THEN 1 ELSE 0 END AS BIGINT) AS churned
            FROM u
        """,
        # pipelines/mlstats.status_priority_chisq: chi2 as an exact
        # integer micro sum — per-cell (O·N - rt·ct)²/(N·rt·ct) rounded
        # half-up via (2·num·1e6 + den)//(2·den) in HUGEINT, zero cells
        # included through the margins cross join
        "status_priority_chisq": chisq_sql,
        # pipelines/mlstats.status_priority_cramers_v: effect size for
        # the chi-square panel — V = sqrt(chi2 / (N*(min(r,c)-1))),
        # one shared float chain over the exact integer chi2_micro
        "status_priority_cramers_v": f"""
            WITH cv AS ({chisq_sql})
            SELECT n,
                   CAST(least(r_levels, c_levels) - 1 AS BIGINT)
                       AS k_min,
                   chi2_micro,
                   CAST(floor(sqrt(
                       (CAST(chi2_micro AS DOUBLE) / 1e6)
                       / CAST(n * (least(r_levels, c_levels) - 1)
                              AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
                       AS v_micro
            FROM cv
        """,
        # pipelines/mlstats.priority_price_welch: Welch t + W-S df per
        # priority pair — exact HUGEINT moments, then ONE shared float
        # chain (identical parenthesisation to the numpy side), 6 dp
        "priority_price_welch": """
            WITH q AS (SELECT o_orderpriority AS pr,
                              CAST(floor(o_totalprice + 0.5) AS BIGINT)
                                  AS y
                       FROM orders),
            m AS (SELECT pr, CAST(count(*) AS HUGEINT) AS n,
                         SUM(CAST(y AS HUGEINT)) AS s,
                         SUM(CAST(y AS HUGEINT) * y) AS s2
                  FROM q GROUP BY pr),
            pp AS (SELECT a.pr AS p1, b.pr AS p2,
                          CAST(a.n AS DOUBLE) AS n1f,
                          CAST(b.n AS DOUBLE) AS n2f,
                          CAST(a.n AS BIGINT) AS n1,
                          CAST(b.n AS BIGINT) AS n2,
                          CAST(a.s AS DOUBLE) AS s1,
                          CAST(b.s AS DOUBLE) AS s2a,
                          CAST(a.s2 AS DOUBLE) AS q1,
                          CAST(b.s2 AS DOUBLE) AS q2
                   FROM m a JOIN m b ON a.pr < b.pr),
            v AS (SELECT p1, p2, n1, n2, n1f, n2f,
                         s1 / n1f AS m1, s2a / n2f AS m2,
                         ((n1f * q1 - s1 * s1) / (n1f * (n1f - 1.0)))
                             / n1f AS se1,
                         ((n2f * q2 - s2a * s2a) / (n2f * (n2f - 1.0)))
                             / n2f AS se2
                  FROM pp)
            SELECT p1, p2, n1, n2,
                   floor((m1 - m2) / sqrt(se1 + se2) * 1e6 + 0.5) / 1e6
                       AS t6,
                   floor((se1 + se2) * (se1 + se2)
                         / (se1 * se1 / (n1f - 1.0)
                            + se2 * se2 / (n2f - 1.0)) * 1e6 + 0.5)
                       / 1e6 AS df6
            FROM v
        """,
        # pipelines/mlstats.supplier_acctbal_anova: SSB/SSW in exact
        # cents² HUGEINT (per-group tdiv terms — order-free), float
        # only in the final F chain
        "supplier_acctbal_anova": """
            WITH q AS (SELECT s_nationkey AS g,
                              CAST(floor(s_acctbal * 100 + 0.5)
                                   AS BIGINT) AS y
                       FROM supplier),
            m AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
                         SUM(CAST(y AS HUGEINT)) AS s,
                         SUM(CAST(y AS HUGEINT) * y) AS s2
                  FROM q GROUP BY g),
            t AS (SELECT CAST(count(*) AS BIGINT) AS k,
                         SUM(n) AS nt, SUM(s) AS st, SUM(s2) AS s2t,
                         SUM((s * s) // n) AS sb
                  FROM m)
            SELECT k, CAST(nt AS BIGINT) AS n,
                   CAST(sb - (st * st) // nt AS BIGINT) AS ssb_c,
                   CAST(s2t - sb AS BIGINT) AS ssw_c,
                   CASE WHEN k < 2 OR CAST(nt AS BIGINT) <= k
                             OR s2t - sb = 0 THEN NULL
                        ELSE floor((CAST(sb - (st * st) // nt AS DOUBLE)
                                    / CAST(k - 1 AS DOUBLE))
                                   / (CAST(s2t - sb AS DOUBLE)
                                      / CAST(CAST(nt AS BIGINT) - k
                                             AS DOUBLE))
                                   * 1e6 + 0.5) / 1e6 END AS f6
            FROM t
        """,
        # pipelines/mlstats.customer_rfm: three NTILE(4) windows over
        # (metric, c_custkey) ascending — DuckDB ntile's first n%4
        # tiles get the extra row, identical to ntile_emit; day ints
        # are epoch_us // 86400000000 on both sides
        "customer_rfm": """
            WITH base AS (
                SELECT o_custkey AS c_custkey,
                       CAST(max(epoch_us(o_orderdate) // 86400000000)
                            AS BIGINT) AS last_day,
                       CAST(count(*) AS BIGINT) AS frequency,
                       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT)) AS BIGINT)
                           AS monetary_cents
                FROM orders GROUP BY o_custkey),
            r AS (SELECT c_custkey,
                         CAST((SELECT max(last_day) FROM base)
                              - last_day AS BIGINT) AS recency_days,
                         frequency, monetary_cents
                  FROM base),
            coded AS (SELECT *,
                  CAST(ntile(4) OVER (ORDER BY recency_days, c_custkey)
                       AS BIGINT) AS r_code,
                  CAST(ntile(4) OVER (ORDER BY frequency, c_custkey)
                       AS BIGINT) AS f_code,
                  CAST(ntile(4) OVER (ORDER BY monetary_cents,
                                      c_custkey) AS BIGINT) AS m_code
                  FROM r)
            SELECT c_custkey, recency_days, frequency, monetary_cents,
                   r_code, f_code, m_code,
                   r_code * 100 + f_code * 10 + m_code AS rfm
            FROM coded
        """,
        # pipelines/sequences.customer_order_streaks: gap-and-islands
        # via the m - row_number() group trick; longest-streak ties
        # resolve to the earliest start (min over the max-length join)
        "customer_order_streaks": """
            WITH ym AS (SELECT DISTINCT o_custkey AS c_custkey,
                               CAST(year(o_orderdate) * 12
                                    + month(o_orderdate) - 1 AS BIGINT)
                                   AS m
                        FROM orders),
            g AS (SELECT c_custkey, m,
                         m - row_number() OVER (PARTITION BY c_custkey
                                                ORDER BY m) AS grp
                  FROM ym),
            isl AS (SELECT c_custkey, grp,
                           CAST(count(*) AS BIGINT) AS len,
                           CAST(min(m) AS BIGINT) AS start_m
                    FROM g GROUP BY c_custkey, grp),
            a AS (SELECT c_custkey,
                         CAST(sum(len) AS BIGINT) AS n_active_months,
                         CAST(count(*) AS BIGINT) AS n_streaks,
                         CAST(max(len) AS BIGINT) AS longest_streak
                  FROM isl GROUP BY c_custkey)
            SELECT a.c_custkey, a.n_active_months, a.n_streaks,
                   a.longest_streak,
                   CAST(min(i.start_m) AS BIGINT) AS longest_start_m
            FROM a JOIN isl i ON i.c_custkey = a.c_custkey
                             AND i.len = a.longest_streak
            GROUP BY a.c_custkey, a.n_active_months, a.n_streaks,
                     a.longest_streak
        """,
        # pipelines/mlstats.knn_label_accuracy: majority vote of the
        # self-join top-5 labels (count desc, smallest label on ties)
        # vs own label; truncating acc_micro
        "knn_label_accuracy": f"""
            WITH knn AS ({_SQL_KNN_SELF}),
            lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label
                    FROM embeddings),
            v AS (SELECT k.query_id, nl.label AS nlabel, count(*) AS c
                  FROM knn k JOIN lab nl ON nl.vec_id = k.vec_id
                  GROUP BY k.query_id, nl.label),
            pred AS (SELECT query_id, nlabel AS pred FROM
                     (SELECT *, row_number() OVER (
                          PARTITION BY query_id
                          ORDER BY c DESC, nlabel ASC) AS rn FROM v)
                     WHERE rn = 1),
            j AS (SELECT p.query_id, lq.label AS true_label, p.pred
                  FROM pred p JOIN lab lq ON lq.vec_id = p.query_id),
            g AS (SELECT true_label, CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(CASE WHEN pred = true_label
                                       THEN 1 ELSE 0 END) AS BIGINT)
                             AS n_correct
                  FROM j GROUP BY true_label)
            SELECT true_label, n, n_correct,
                   n_correct * 1000000 // n AS acc_micro
            FROM g
        """,
        # pipelines/mlstats.embedding_silhouette: simplified silhouette
        # (centroid form, squared distances) under a MILLI-unit integer
        # contract; all divisions truncate toward zero (DuckDB //)
        # stages/dbscan.dbscan: exact DBSCAN (Ester 1996) — milli-int
        # distances, recursive-CTE core components, min-cluster border
        # attachment, -1 noise
        "embedding_dbscan": f"""
            WITH RECURSIVE dbq AS (
                SELECT vec_id,
                       CAST(generate_subscripts(embedding, 1)
                            AS BIGINT) AS i,
                       CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                  * 1000 + 0.5) AS BIGINT) AS x
                FROM embeddings),
            dbe AS MATERIALIZED (
                SELECT a.vec_id AS va, b.vec_id AS vb
                FROM dbq a JOIN dbq b ON b.i = a.i
                                     AND b.vec_id > a.vec_id
                GROUP BY a.vec_id, b.vec_id
                HAVING sum((a.x - b.x) * (a.x - b.x))
                       <= {DBSCAN_EPS_MILLI ** 2}),
            dbdeg AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS deg
                      FROM (SELECT va AS vec_id FROM dbe
                            UNION ALL SELECT vb FROM dbe)
                      GROUP BY vec_id),
            dbcore AS MATERIALIZED (
                SELECT e.vec_id
                FROM embeddings e
                LEFT JOIN dbdeg d ON d.vec_id = e.vec_id
                WHERE coalesce(d.deg, 0) + 1 >= {DBSCAN_MIN_PTS}),
            dbce AS MATERIALIZED (
                SELECT va AS u, vb AS v FROM dbe
                WHERE va IN (SELECT vec_id FROM dbcore)
                  AND vb IN (SELECT vec_id FROM dbcore)
                UNION
                SELECT vb, va FROM dbe
                WHERE va IN (SELECT vec_id FROM dbcore)
                  AND vb IN (SELECT vec_id FROM dbcore)),
            dbreach AS (
                SELECT vec_id AS node, vec_id AS r FROM dbcore
                UNION
                SELECT e.u AS node, dbreach.r
                FROM dbce e JOIN dbreach ON dbreach.node = e.v),
            dbcomp AS MATERIALIZED (
                SELECT node, CAST(min(r) AS BIGINT) AS cluster
                FROM dbreach GROUP BY node),
            dbborder AS (
                SELECT n.x AS vec_id,
                       CAST(min(c.cluster) AS BIGINT) AS cluster
                FROM (SELECT va AS x, vb AS y FROM dbe
                      UNION ALL SELECT vb, va FROM dbe) n
                JOIN dbcomp c ON c.node = n.y
                WHERE n.x NOT IN (SELECT vec_id FROM dbcore)
                GROUP BY n.x)
            SELECT e.vec_id,
                   CASE WHEN cp.node IS NOT NULL THEN 'core'
                        WHEN bo.vec_id IS NOT NULL THEN 'border'
                        ELSE 'noise' END AS role,
                   CAST(coalesce(cp.cluster, bo.cluster, -1)
                        AS BIGINT) AS cluster
            FROM embeddings e
            LEFT JOIN dbcomp cp ON cp.node = e.vec_id
            LEFT JOIN dbborder bo ON bo.vec_id = e.vec_id
        """,
        "embedding_silhouette": """
            WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                              CAST(generate_subscripts(embedding, 1)
                                   AS BIGINT) AS i,
                              CAST(floor(CAST(unnest(embedding)
                                              AS DOUBLE) * 1000 + 0.5)
                                   AS BIGINT) AS q
                       FROM embeddings),
            cent AS (SELECT label AS clabel, i,
                            CAST(SUM(q) // count(*) AS BIGINT) AS m
                     FROM e GROUP BY label, i),
            dist AS (SELECT e.vec_id, MIN(e.label) AS label, c.clabel,
                            CAST(SUM((e.q - c.m) * (e.q - c.m))
                                 AS BIGINT) AS d2
                     FROM e JOIN cent c ON c.i = e.i
                     GROUP BY e.vec_id, c.clabel),
            ab AS (SELECT vec_id, label,
                          max(CASE WHEN clabel = label THEN d2 END)
                              AS a,
                          min(CASE WHEN clabel <> label THEN d2 END)
                              AS b
                   FROM dist GROUP BY vec_id, label),
            s AS (SELECT label, (b - a) * 1000000
                             // greatest(greatest(a, b), 1) AS sm
                  FROM ab)
            SELECT label, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(sm) AS BIGINT) AS sum_sil_micro,
                   CAST(sum(CASE WHEN sm > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_pos,
                   CAST(sum(sm) AS BIGINT) // CAST(count(*) AS BIGINT)
                       AS mean_sil_micro
            FROM s GROUP BY label
        """,
        # pipelines/queries.q_mutual_knn_degree: degree histogram of
        # the mutual-kNN graph over the self-join hit list
        "mutual_knn_degree": f"""
            WITH mh AS ({_SQL_KNN_SELF}),
            mcp AS (SELECT least(query_id, vec_id) AS u,
                           greatest(query_id, vec_id) AS v FROM mh),
            mme AS (SELECT u, v FROM mcp GROUP BY u, v
                    HAVING count(*) = 2),
            mdg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
                    FROM (SELECT u AS node FROM mme
                          UNION ALL SELECT v FROM mme)
                    GROUP BY node)
            SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
            FROM mdg GROUP BY degree
        """,
        # pipelines/queries.q_supplier_part_stats: supplier scorecard
        # (first supplier-table consumer)
        "supplier_part_stats": """
            WITH sl AS (SELECT l_suppkey AS s_suppkey, l_partkey,
                               CAST(floor(l_extendedprice * 100 + 0.5)
                                    AS BIGINT) AS cents
                        FROM lineitem),
            sg AS (SELECT s_suppkey,
                          CAST(count(DISTINCT l_partkey) AS BIGINT)
                              AS n_parts,
                          CAST(count(*) AS BIGINT) AS n_lines,
                          CAST(sum(cents) AS BIGINT) AS revenue_cents
                   FROM sl GROUP BY s_suppkey)
            SELECT sg.s_suppkey, su.s_name, sg.n_parts, sg.n_lines,
                   sg.revenue_cents
            FROM sg JOIN supplier su ON su.s_suppkey = sg.s_suppkey
        """,
        # pipelines/queries.q_nation_supplier_balance
        "nation_supplier_balance": """
            SELECT CAST(s.s_nationkey AS BIGINT) AS n_nationkey,
                   n.n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
                   CAST(sum(s.bal) AS BIGINT) AS bal_cents,
                   min(s.bal) AS min_bal_cents,
                   max(s.bal) AS max_bal_cents
            FROM (SELECT s_nationkey,
                         CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)
                             AS bal
                  FROM supplier) s
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            GROUP BY s.s_nationkey, n.n_name
        """,
        # pipelines/mlstats.corpus_lexical_panel: Yule's K / Simpson's
        # D / TTR / hapax over document whitespace tokens — pure-integer
        # truncating divisions, HUGEINT lifts
        "corpus_lexical_panel": r"""
            WITH lxw AS (SELECT list_filter(
                                    regexp_split_to_array(text, '\s+'),
                                    x -> x <> '') AS ws
                         FROM documents),
            lxt AS (SELECT unnest(ws) AS tok FROM lxw),
            lxc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
                    FROM lxt GROUP BY tok),
            lxa AS (SELECT CAST(sum(c) AS HUGEINT) AS n,
                           CAST(count(*) AS HUGEINT) AS v,
                           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                                AS HUGEINT) AS v1,
                           CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)
                                AS HUGEINT) AS v2,
                           SUM(CAST(c AS HUGEINT) * c) AS s2,
                           SUM(CAST(c AS HUGEINT) * (c - 1)) AS ss
                    FROM lxc)
            SELECT CAST(n AS BIGINT) AS n_tokens,
                   CAST(v AS BIGINT) AS n_types,
                   CAST(v1 AS BIGINT) AS hapax,
                   CAST(v2 AS BIGINT) AS dis_legomena,
                   CAST(v * 1000000 // n AS BIGINT) AS ttr_micro,
                   CAST(v1 * 1000000 // v AS BIGINT) AS hapax_micro,
                   CAST((s2 - n) * 10000000000 // (n * n) AS BIGINT)
                       AS yule_k_micro,
                   CAST(ss * 1000000 // (n * (n - 1)) AS BIGINT)
                       AS simpson_micro
            FROM lxa
        """,
        # pipelines/mlstats.status_price_skewkurt: g1/g2 from exact
        # HUGEINT power sums of hectodollar prices; shared float chains
        "status_price_skewkurt": """
            WITH skh AS (SELECT o_orderstatus,
                                CAST(floor(o_totalprice / 100.0)
                                     AS BIGINT) AS h
                         FROM orders),
            sks AS (SELECT o_orderstatus,
                           CAST(count(*) AS HUGEINT) AS n,
                           SUM(CAST(h AS HUGEINT)) AS s1,
                           SUM(CAST(h AS HUGEINT) * h) AS s2,
                           SUM(CAST(h AS HUGEINT) * h * h) AS s3,
                           SUM(CAST(h AS HUGEINT) * h * h * h) AS s4
                    FROM skh GROUP BY o_orderstatus),
            ska AS (SELECT o_orderstatus, n,
                           n * s2 - s1 * s1 AS a2,
                           n * n * s3 - 3 * n * s1 * s2
                               + 2 * s1 * s1 * s1 AS a3,
                           n * n * n * s4 - 4 * n * n * s1 * s3
                               + 6 * n * s1 * s1 * s2
                               - 3 * s1 * s1 * s1 * s1 AS a4
                    FROM sks)
            SELECT o_orderstatus, CAST(n AS BIGINT) AS n,
                   CAST(a2 * 1000000 // (n * n) AS BIGINT) AS m2_micro,
                   CASE WHEN n < 2 OR a2 = 0 THEN NULL
                        ELSE CAST(floor(CAST(a3 AS DOUBLE)
                             / (CAST(a2 AS DOUBLE)
                                * sqrt(CAST(a2 AS DOUBLE)))
                             * 1e6 + 0.5) AS BIGINT)
                   END AS skew_micro,
                   CASE WHEN n < 2 OR a2 = 0 THEN NULL
                        ELSE CAST(floor((CAST(a4 AS DOUBLE)
                             / (CAST(a2 AS DOUBLE)
                                * CAST(a2 AS DOUBLE)) - 3.0)
                             * 1e6 + 0.5) AS BIGINT)
                   END AS kurt_micro
            FROM ska
        """,
        # pipelines/mlstats.nb_lang_eval: multinomial Naive Bayes
        # langid + resubstitution accuracy — micro-nat integer weights,
        # argmax ties to smallest lang
        "nb_lang_eval": r"""
            WITH nbw AS (SELECT doc_id, lang,
                                list_filter(regexp_split_to_array(
                                    text, '\s+'), x -> x <> '') AS ws
                         FROM documents),
            nbt AS (SELECT doc_id, lang, unnest(ws) AS tok FROM nbw),
            nbtf AS (SELECT doc_id, lang, tok,
                            CAST(count(*) AS BIGINT) AS tf
                     FROM nbt GROUP BY ALL),
            nbc AS (SELECT lang AS cand, tok,
                           CAST(sum(tf) AS BIGINT) AS c
                    FROM nbtf GROUP BY ALL),
            nbn AS (SELECT cand, CAST(sum(c) AS BIGINT) AS ntok
                    FROM nbc GROUP BY cand),
            nbv AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
                    FROM nbtf),
            nbp AS (SELECT lang AS cand,
                           CAST(count(*) AS BIGINT) AS nd
                    FROM documents GROUP BY lang),
            nbd AS (SELECT CAST(count(*) AS BIGINT) AS nd
                    FROM documents),
            nbs AS (SELECT t.doc_id, t.lang AS actual, p.cand,
                           SUM(t.tf * CAST(floor(ln(
                               CAST(coalesce(c.c, 0) + 1 AS DOUBLE)
                               / CAST(n.ntok + nbv.v AS DOUBLE))
                               * 1e6 + 0.5) AS BIGINT)) AS s
                    FROM nbtf t
                    CROSS JOIN nbp p
                    JOIN nbn n ON n.cand = p.cand
                    CROSS JOIN nbv
                    LEFT JOIN nbc c ON c.cand = p.cand
                                   AND c.tok = t.tok
                    GROUP BY ALL),
            nbx AS (SELECT nbs.doc_id, nbs.actual, nbs.cand,
                           nbs.s + CAST(floor(ln(CAST(p.nd AS DOUBLE)
                               / CAST(d.nd AS DOUBLE)) * 1e6 + 0.5)
                               AS BIGINT) AS score
                    FROM nbs JOIN nbp p ON p.cand = nbs.cand
                    CROSS JOIN nbd d),
            nbpred AS (SELECT doc_id, actual, cand AS pred,
                              row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, cand ASC) AS rk
                       FROM nbx QUALIFY rk = 1)
            SELECT actual AS lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN pred = actual THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_correct,
                   CAST(sum(CASE WHEN pred = actual THEN 1 ELSE 0 END)
                        * 1000000 // count(*) AS BIGINT) AS acc_micro
            FROM nbpred GROUP BY actual
        """,
        # stages/knn.dequantize_batch + knn_topk: the int8-at-rest ANN
        # path, hit lists hash-checked (deterministic quantization)
        "knn_quantized_topk": _SQL_KNN_QUANT_TOPK,
        # quality of the quantized path vs the exact float top-k — the
        # recall number itself is SQL-checked
        "knn_quantized_recall": f"""
            WITH exact AS (SELECT query_id, vec_id
                           FROM ({_SQL_KNN_EXACT})),
            quant AS (SELECT query_id, vec_id
                      FROM ({_SQL_KNN_QUANT_TOPK}))
            SELECT 'int8' AS method,
                   floor(CAST((SELECT count(*) FROM exact
                               JOIN quant USING (query_id, vec_id))
                              AS DOUBLE) / 50 * 1e6 + 0.5) / 1e6
                       AS recall_at_10
        """,
    }
