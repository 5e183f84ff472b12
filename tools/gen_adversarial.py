#!/usr/bin/env python3
"""Build the ADVERSARIAL corpus twin (dev tooling, not part of the
library): copy a scale-factor dir and mutate it along the eight
dimensions that hunt cross-engine (Spark/DuckDB) divergence the driver
fixtures never exercise. Record so far: dimension 1 surfaced the
`\\s+` split-law dialect gap (Java vs RE2 on U+000B) across 7 ops;
dimension 2 surfaced the TSV newline-sanitize and CSV escape/multiLine
bugs; dimensions 3 (relational ties/boundaries) and 4 (zero-token docs,
vector cosine ties) were green on the first pass; dimension 5
(unicode-hostile casing, round 11) surfaced the Java-full-casing vs
utf8proc divergence across 22 text ops and forced the dialect-free
ASCII casefold law; dimension 6 (scale skew: giant doc, singleton
languages, round 11) was green on the first pass; dimension 7
(hostile group keys, round 12) surfaced 10 red ops in the packing/
mix/shard family — null-dropping USING joins, null-splitting full
outers, the Spark-NULLS-FIRST vs DuckDB-NULLS-LAST ordering gap, and
fingerprint(NULL) divergence, all fixed. Re-run every round:

    python3 tools/gen_adversarial.py [srcDir] [dstDir]
    sbt -batch "runMain graft.Verify <dstDir> /tmp/adv_out"
    python3 tools/check.py <dstDir> /tmp/adv_out      # expect 0 fail

Dimensions:
  1. documents.text — vertical tabs, NBSP-glued words, tab-substituted
     spaces, CRLF endings, unicode, plus EMPTY and whitespace-only
     documents (regex-dialect + tokenizer laws, zero-token edges);
  2. events — duplicate timestamps within user sessions and duplicated
     double values (every window/sessionize/as-of tie-break);
     part/customer — embedded quotes, commas, raw newlines, tabs,
     empty and CRLF/unicode names (CSV/TSV escaping, fuzzy matching);
  3. lineitem/orders — duplicated prices/quantities within orders,
     zero quantities, midnight-truncated and duplicated dates, rounded
     totals; supplier — empty/tab/unicode names (pricing ladders,
     rollups, join guards);
  5. documents.text, unicode-hostile (round 11) — context-sensitive
     casing (Greek final sigma, Turkish dotted I: Java full-casing vs
     utf8proc simple-casing), astral-plane emoji (code-point vs
     code-unit length laws), NFD combining marks, zero-width
     space/joiner, BOM, RTL text (every lower()/length()/tokenizer
     law);
  6. documents, scale-skew (round 11) — doc 17 becomes a GIANT
     (30k-word repeated phrase appended: per-doc array laws, hot
     bigram counts, chunk/pack/span fan-out), doc 23 moves to a
     SINGLETON standing language 'xx' (per-language models trained on
     one doc; tercile cut2 is NULL), doc 30 moves to a singleton DELTA
     language 'yy' (no standing model at all — the add-zero /
     missing-cuts fallthrough paths must agree across engines);
  7. documents lang/source, hostile GROUP KEYS (round 12) — NULL
     (one group, JOINs never match), empty string (distinct from
     NULL), quote+tab bytes inside a key, fullwidth 'ＥＮ' (the
     ASCII-only casefold must NOT unify it) — every per-language /
     per-source law: ppl model probe + terciles, lang-id, data card,
     samplers, manifests, streaming legs;
  8. relational NULLs (round 12) — events with NULL user_id /
     event_type / value (sessionize/funnel/window/streaming state
     keys: primitive encoders must not silently coerce, laws declare
     explicit null gates spelled in both engines), part with NULL
     p_name / p_brand (fuzzy blocking, pricing ladders), customer
     with NULL c_name (feed export COALESCE chains).

Embeddings: every 10th vector duplicates its predecessor exactly —
exact cosine ties through the whole vector family (dimension 4 in the
round-10 count, with the zero-token documents).
"""
import shutil, os, glob, sys

import duckdb


def main(src, dst):
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for p in glob.glob(f"{src}/*.parquet"):
        name = os.path.basename(p)
        if os.path.isdir(p):
            shutil.copytree(p, f"{dst}/{name}")
        else:
            shutil.copy(p, f"{dst}/{name}")
    con = duckdb.connect()

    con.execute(f"""
    COPY (
      -- dimension 7 (round 12): HOSTILE GROUP KEYS — every per-language
      -- / per-source law (ppl terciles + model probe joins, lang-id,
      -- data card, stratified samplers, shard manifests, stream legs)
      -- must agree across engines when the key is NULL (groups as one
      -- partition, JOINs never match), EMPTY (distinct from NULL),
      -- carries hostile bytes (quote + tab in a key that rides dump/
      -- compare plumbing), or a non-ASCII case variant the dialect-free
      -- casefold intentionally does NOT fold. %41 avoids the dim-6 docs
      -- (17, 23, 30) and composes freely with the text dimensions.
      -- residue 18 NULLs BOTH keys on the SAME row (ADVICE r12: the
      -- 11-16 residues are pairwise disjoint, so compound-NULL group
      -- keys — the shape where a null-safe join on one key but not
      -- the other slips through — were untested)
      SELECT doc_id, text,
        CASE WHEN doc_id % 41 = 11 THEN NULL
             WHEN doc_id % 41 = 12 THEN ''
             WHEN doc_id % 41 = 16 THEN 'ＥＮ'
             WHEN doc_id % 41 = 18 THEN NULL
             ELSE lang END AS lang,
        CASE WHEN doc_id % 41 = 13 THEN NULL
             WHEN doc_id % 41 = 14 THEN ''
             WHEN doc_id % 41 = 15 THEN 'src "q"' || chr(9) || 'tab'
             WHEN doc_id % 41 = 18 THEN NULL
             ELSE source END AS source,
        n_chars
      FROM (
      SELECT doc_id,
        CASE WHEN doc_id % 31 = 5 THEN ''
             WHEN doc_id % 31 = 6 THEN '   '
             WHEN doc_id % 31 = 7 THEN chr(9) || chr(13) || chr(10)
             ELSE CASE doc_id % 7
               WHEN 0 THEN text || ' tail' || chr(11) || 'after_vtab'
               WHEN 1 THEN 'nbsp' || chr(160) || 'glued ' || text
               WHEN 2 THEN replace(text, ' ', chr(9))
               WHEN 3 THEN text || chr(13) || chr(10) || 'crlf line'
               WHEN 4 THEN 'Unicode 文字 ' || text
               ELSE text END END AS text,
        lang, source, n_chars
      FROM (
        -- dimension 6: scale skew — applied OVER the dimension-5
        -- prefixes (this subquery wraps dim 5) and UNDER dimension 1;
        -- docs 17/23/30 hit no %37 branch, so the order is currently
        -- immaterial, but keep the nesting honest for future dims
        SELECT doc_id,
          CASE WHEN doc_id = 17
               THEN text || ' ' ||
                 repeat('lorem ipsum dolor sit amet consectetur ', 5000)
               ELSE text END AS text,
          CASE WHEN doc_id = 23 THEN 'xx'
               WHEN doc_id = 30 THEN 'yy'
               ELSE lang END AS lang,
          source, n_chars
      FROM (
        -- dimension 5: unicode-hostile prefixes, composed UNDER the
        -- dimension-1 mutations (a doc can be both case-hostile and
        -- whitespace-hostile)
        SELECT doc_id,
          CASE doc_id % 37
            -- context-sensitive casing: Java String.toLowerCase applies
            -- the SpecialCasing final-sigma rule, utf8proc's simple
            -- casing does not
            WHEN 3 THEN 'ΙΣΟΣ ΟΔΟΣ κόσμος ' || text
            -- Turkish dotted I: full lowercase of U+0130 is i+U+0307
            -- (two code points), simple lowercase is bare i (one)
            WHEN 4 THEN 'İstanbul Iı DOTTED ' || text
            -- astral plane: code-point vs code-unit length laws
            WHEN 5 THEN 'emoji 🎉🚀 mixed 𠀀 cjkb ' || text
            -- NFD combining acute vs precomposed NFC twin
            WHEN 6 THEN 'cafe' || chr(769) || ' nfd café nfc ' || text
            -- zero-width space / joiner inside words
            WHEN 7 THEN 'zero' || chr(8203) || 'width' || chr(8205)
                        || 'joined ' || text
            -- BOM / zero-width no-break space leading the document
            WHEN 8 THEN chr(65279) || 'bom lead ' || text
            -- RTL run plus an explicit RTL-override control
            WHEN 9 THEN 'مرحبا بالعالم ' || chr(8238) || 'rtl ' || text
            -- sharp-s casing triangle (ß, uppercase ẞ)
            WHEN 10 THEN 'straße STRASSE ẞharp ' || text
            ELSE text END AS text,
          lang, source, n_chars
        FROM read_parquet('{src}/documents.parquet')))
    )) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
    COPY (
      SELECT a.vec_id, a.label,
        CASE WHEN a.vec_id % 10 = 1 AND b.embedding IS NOT NULL
             THEN b.embedding ELSE a.embedding END AS embedding
      FROM read_parquet('{src}/embeddings.parquet') a
      LEFT JOIN read_parquet('{src}/embeddings.parquet') b
        ON b.vec_id = a.vec_id - 1
    ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
    COPY (
      -- dimension 8 (round 12): relational NULLs — a production event
      -- stream HAS null users/values/types; every consumer must either
      -- declare an explicit null gate (spelled in BOTH engines) or
      -- aggregate with SQL null semantics. %47 composes with the
      -- dim-2 tie mutations below.
      -- residue 24 NULLs user_id AND event_type AND value on the SAME
      -- row (compound-NULL keys, ADVICE r12)
      SELECT event_id, ts,
        CASE WHEN event_id % 47 IN (21, 24) THEN NULL ELSE user_id END AS user_id,
        CASE WHEN event_id % 47 IN (23, 24) THEN NULL ELSE event_type END AS event_type,
        CASE WHEN event_id % 47 IN (22, 24) THEN NULL ELSE value END AS value,
        props
      FROM (
      SELECT event_id,
        CASE WHEN event_id % 5 = 0 AND lag(ts) OVER w IS NOT NULL
             THEN lag(ts) OVER w ELSE ts END AS ts,
        user_id, event_type,
        CASE WHEN event_id % 11 = 0 AND lag(value) OVER w IS NOT NULL
             THEN lag(value) OVER w ELSE value END AS value,
        props
      FROM read_parquet('{src}/events.parquet')
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    ) TO '{dst}/events.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
    COPY (
      SELECT p_partkey,
        -- %23=9 NULLs name AND brand on the SAME row (compound, ADVICE r12)
        CASE WHEN p_partkey % 23 IN (8, 9) THEN NULL -- dim 8: null name
        ELSE CASE p_partkey % 11
          WHEN 0 THEN p_name || ', "quoted, comma"'
          WHEN 1 THEN p_name || chr(10) || 'second line'
          WHEN 2 THEN 'Ünïcødé ' || p_name
          WHEN 3 THEN p_name || chr(9) || 'tabbed'
          WHEN 4 THEN ''
          ELSE p_name END END AS p_name,
        CASE WHEN p_partkey % 23 IN (7, 9) THEN NULL -- dim 8: null brand
             ELSE p_brand END AS p_brand,
        p_type, p_size, p_retailprice
      FROM read_parquet('{src}/part.parquet')
    ) TO '{dst}/part.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
    COPY (
      SELECT c_custkey,
        CASE c_custkey % 13
          WHEN 0 THEN ''
          WHEN 1 THEN 'Müller' || chr(13) || chr(10) || 'GmbH'
          WHEN 2 THEN NULL -- dim 8: null customer name
          ELSE c_name END AS c_name,
        c_nationkey, c_acctbal, c_mktsegment
      FROM read_parquet('{src}/customer.parquet')
    ) TO '{dst}/customer.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
    COPY (
      SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        CASE WHEN l_orderkey % 9 = 0 THEN 0.0
             WHEN l_orderkey % 9 = 1 THEN lag(l_quantity) OVER w
             ELSE l_quantity END AS l_quantity,
        CASE WHEN l_orderkey % 7 = 0
               AND lag(l_extendedprice) OVER w IS NOT NULL
             THEN lag(l_extendedprice) OVER w
             ELSE l_extendedprice END AS l_extendedprice,
        l_discount, l_tax, l_returnflag, l_linestatus,
        CASE WHEN l_orderkey % 5 = 0 THEN date_trunc('day', l_shipdate)
             WHEN l_orderkey % 5 = 1 AND lag(l_shipdate) OVER w IS NOT NULL
             THEN lag(l_shipdate) OVER w
             ELSE l_shipdate END AS l_shipdate
      FROM read_parquet('{src}/lineitem.parquet')
      WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
    ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
    COPY (
      SELECT o_orderkey, o_custkey, o_orderstatus,
        CASE WHEN o_orderkey % 8 = 0 THEN round(o_totalprice, 0)
             ELSE o_totalprice END AS o_totalprice,
        CASE WHEN o_orderkey % 6 = 0 THEN date_trunc('day', o_orderdate)
             ELSE o_orderdate END AS o_orderdate,
        o_orderpriority
      FROM read_parquet('{src}/orders.parquet')
    ) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
    COPY (
      SELECT s_suppkey,
        CASE s_suppkey % 10
          WHEN 0 THEN ''
          WHEN 1 THEN 'Søren & Sons' || chr(9) || 'AS'
          ELSE s_name END AS s_name,
        s_nationkey, s_acctbal
      FROM read_parquet('{src}/supplier.parquet')
    ) TO '{dst}/supplier.parquet' (FORMAT PARQUET)""")

    # self-check (r13 verdict #5 done-condition): the twin must carry
    # COMPOUND-NULL rows — >=2 NULL key columns on the SAME row — in
    # every table that has a compound residue; a residue arithmetic
    # change (mod shifted, id range too small) would otherwise silently
    # drop the exact shape the dimension exists to test
    checks = {
        "documents": "lang IS NULL AND source IS NULL",
        "events": "user_id IS NULL AND event_type IS NULL "
                  "AND value IS NULL",
        "part": "p_name IS NULL AND p_brand IS NULL",
    }
    for table, pred in checks.items():
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{table}.parquet') "
            f"WHERE {pred}").fetchone()[0]
        if n == 0:
            raise SystemExit(
                f"[adversarial] {table}: zero compound-NULL rows "
                f"({pred}) — residue arithmetic regressed")
        print(f"[adversarial] {table}: {n} compound-NULL rows")
    print(f"[adversarial] wrote mutated twin of {src} at {dst}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_adversarial")
