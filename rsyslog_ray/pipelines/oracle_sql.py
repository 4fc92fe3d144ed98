"""DuckDB oracle SQL mirroring the engine queries (driver correctness gate).

The parse CTE replicates the engine's sanitize → PRI → RFC5424/RFC3164
cascade with the SAME RE2 patterns (DuckDB's regex engine is also RE2, so
semantics are identical by construction). Transcripts are read from the
deterministic parquet that datagen.ensure_transcripts writes under /tmp —
the driver runs at sf=0.01, so paths are pinned to that tag.
"""

from __future__ import annotations

from ..datagen import transcripts_path

TRANSCRIPTS_GLOB = transcripts_path("sf0.01") + "/part-*.parquet"

# RE2 patterns — numbered-group versions of stages/parse.py's named patterns
# lenient-SD branch mirrors the engine (pmrfc5424.c:287 unchecked
# SD-parse failure: remainder becomes MSG)
P5424 = (r"^1 (\S+) (\S+) (\S+) (\S+) (\S+) "
         r"(?:(-|(?:\[(?:[^\]\\]|\\[\s\S])*\])+)(?: ([\s\S]*))?"
         r"|([\s\S]*))$")
P3164 = (r"^ ?(?:(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?"
         r"(?:Z|[+-]\d{2}:\d{2})?)|([A-Z][a-z]{2}) ([ 0-3]?\d) "
         r"(\d{2}:\d{2}:\d{2})) ([A-Za-z0-9._-]+)"
         r"(?: ([\s\S]*))?$")
P3339 = (r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})(\.\d+)?"
         r"(Z|[+-]\d{2}:\d{2})?$")


def _parse_cte(src: str = TRANSCRIPTS_GLOB) -> str:
    """CTE chain ending in view `parsed` with the engine's parse columns."""
    return f"""
WITH raw AS (
  SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role, tool, ts,
         substr(replace(replace(regexp_replace(text, '[\\n\\r\\x00]+$', ''),
                chr(9), '#011'), chr(7), '#007'), 1, 8096) AS s
  FROM read_parquet('{src}')
),
live AS (SELECT * FROM raw WHERE length(s) > 0),
pri1 AS (
  SELECT *, regexp_extract(s, '^<([0-9]{{1,3}})>', 1) AS pri_str FROM live
),
pri2 AS (
  SELECT *, (pri_str <> '' AND TRY_CAST(pri_str AS INTEGER) <= 191) AS pri_ok
  FROM pri1
),
pri3 AS (
  SELECT *,
    CASE WHEN pri_ok THEN CAST(pri_str AS BIGINT) ELSE 13 END AS pri,
    CASE WHEN pri_ok
         THEN regexp_extract(s, '^<[0-9]{{1,3}}>([\\s\\S]*)$', 1)
         ELSE s END AS rest
  FROM pri2
),
mm AS (
  SELECT *,
    regexp_matches(rest, '{P5424}') AS is5424,
    regexp_extract(rest, '{P5424}',
      ['t5','h5','a5','p5','m5','sd5','msg5','msgbad5']) AS g5,
    regexp_extract(rest, '{P3164}',
      ['t33','mon','day','hms','h3','body3']) AS g3,
    regexp_matches(rest, '{P3164}') AS m3164
  FROM pri3
),
cls AS (
  SELECT *,
    (NOT is5424 AND m3164) AS is3164,
    (NOT is5424 AND NOT m3164
     AND regexp_matches(rest, '^ *[\\[{{]')) AS ishdrless
  FROM mm
),
-- the reference TAG scan (tools/pmrfc3164.c:341-366): tag runs to ':'
-- (included) or SP (excluded, stays in msg) or end-of-body; first
-- words longer than TAG_MAX=32 BYTES yield no tag (engine subset).
-- strpos/substr count CHARACTERS in DuckDB while the engine counts
-- UTF-8 bytes, so the <=TAG_MAX checks go through octet_length of the
-- character prefix; extraction itself stays character-based (the cut
-- lands on a single-byte ':'/SP delimiter, so chars == same string)
tagscan AS (
  SELECT *,
    coalesce(g3.body3, '') AS body3,
    strpos(coalesce(g3.body3, ''), ':') AS icol,
    strpos(coalesce(g3.body3, ''), ' ') AS isp
  FROM cls
),
tagbytes AS (
  SELECT *,
    CASE WHEN icol > 0
         THEN octet_length(encode(substr(body3, 1, icol))) ELSE 0 END AS icol_b,
    CASE WHEN isp > 0
         THEN octet_length(encode(substr(body3, 1, isp))) ELSE 0 END AS isp_b
  FROM tagscan
),
tagcut AS (
  SELECT *,
    CASE
      WHEN icol > 0 AND (isp = 0 OR icol < isp) AND icol_b <= 33
        THEN icol
      WHEN isp > 0 AND (icol = 0 OR isp < icol) AND isp_b <= 33
        THEN isp - 1
      WHEN icol = 0 AND isp = 0
           AND octet_length(encode(body3)) BETWEEN 1 AND 32
        THEN length(body3)
      ELSE 0 END AS tagcut
  FROM tagbytes
),
flds AS (
  SELECT conv_id, turn_idx, role, tool, ts, s, pri, rest,
    is5424, is3164, ishdrless,
    (is5424 OR is3164 OR ishdrless) AS parse_success,
    CASE WHEN is5424 THEN 1 WHEN (is3164 OR ishdrless) THEN 0 ELSE -1 END AS protocol,
    pri // 8 AS facility, pri % 8 AS severity,
    CASE WHEN is5424 THEN g5.h5 WHEN is3164 THEN g3.h3 ELSE '' END AS hostname,
    CASE WHEN is3164 THEN substr(body3, 1, tagcut) ELSE '' END AS tag,
    CASE WHEN is5424 THEN g5.a5
         WHEN is3164 THEN rtrim(substr(body3, 1, tagcut), ':')
         ELSE '' END AS appname,
    CASE WHEN is5424 THEN g5.p5 ELSE '' END AS procid,
    CASE WHEN is5424 THEN g5.m5 ELSE '' END AS msgid,
    CASE WHEN is5424 THEN g5.sd5 ELSE '' END AS structured_data,
    CASE WHEN is5424 THEN
           CASE WHEN coalesce(g5.sd5, '') <> '' THEN coalesce(g5.msg5, '')
                ELSE coalesce(g5.msgbad5, '') END
         WHEN is3164 THEN substr(body3, tagcut + 1) ELSE rest END AS msg,
    CASE WHEN is5424 THEN g5.t5
         WHEN is3164 THEN coalesce(g3.t33, '') ELSE '' END AS ts_str,
    CASE WHEN is3164 AND coalesce(g3.t33, '') = '' THEN g3.mon ELSE '' END AS mon3,
    CASE WHEN is3164 AND coalesce(g3.t33, '') = '' THEN g3.day ELSE '' END AS day3,
    CASE WHEN is3164 AND coalesce(g3.t33, '') = '' THEN g3.hms ELSE '' END AS hms3
  FROM tagcut
),
tsx AS (
  SELECT *,
    regexp_extract(ts_str, '{P3339}', ['b','f','z']) AS tparts
  FROM flds
),
tsy AS (
  SELECT *,
    try_strptime(tparts.b, '%Y-%m-%dT%H:%M:%S') AS tbase,
    CAST(rpad(coalesce(nullif(substr(tparts.f, 2, 6), ''), '0'), 6, '0') AS BIGINT) AS frac_us,
    CASE WHEN tparts.z LIKE '+%' OR tparts.z LIKE '-%'
         THEN (CASE WHEN tparts.z LIKE '-%' THEN -1 ELSE 1 END)
              * (CAST(substr(tparts.z, 2, 2) AS BIGINT) * 3600
                 + CAST(substr(tparts.z, 5, 2) AS BIGINT) * 60)
         ELSE 0 END AS off_s,
    CASE WHEN mon3 <> '' THEN
      try_strptime('2024-' ||
        lpad(CAST(list_position(['Jan','Feb','Mar','Apr','May','Jun','Jul',
                                 'Aug','Sep','Oct','Nov','Dec'], mon3) AS VARCHAR), 2, '0')
        || '-' || lpad(trim(day3), 2, '0') || 'T' || hms3, '%Y-%m-%dT%H:%M:%S')
      ELSE NULL END AS t3164
  FROM tsx
),
parsed AS (
  SELECT conv_id, turn_idx, role, tool, ts, s AS text, pri, facility,
    severity, protocol, parse_success, hostname, tag, appname, procid,
    msgid, structured_data, msg,
    coalesce(
      CASE WHEN tbase IS NOT NULL
           THEN tbase + to_microseconds(frac_us) - to_seconds(off_s)
           ELSE NULL END,
      t3164, ts) AS ts_reported,
    starts_with(ltrim(msg), '@cee:') AS is_cee,
    CASE WHEN tag <> '' THEN tag ELSE appname END AS syslogtag
  FROM tsy
)"""


# CEE payload: engine normalizes via json.dumps(sort_keys, compact); the
# fixture payloads are already compact+sorted so the raw payload is the
# normalized form — the SQL checks validity with TRY_CAST to JSON.
_CEE = """
cee AS (
  SELECT *,
    ltrim(substr(ltrim(msg), 6)) AS cee_payload,
    (starts_with(ltrim(msg), '@cee:')
     AND TRY_CAST(ltrim(substr(ltrim(msg), 6)) AS JSON) IS NOT NULL)
      AS cee_parsesuccess
  FROM parsed
)"""

# alive = rows surviving the stop statement (discard: severity 7 + system)
_ALIVE = """
alive AS (
  SELECT * FROM cee WHERE NOT (severity = 7 AND role = 'system')
)"""

_RFC3339_FMT = "'%Y-%m-%dT%H:%M:%S.%f+00:00'"


def _jesc(col: str) -> str:
    return (f"replace(replace({col}, chr(92), chr(92) || chr(92)), "
            f"'\"', chr(92) || '\"')")


def _sp(msgcol: str) -> str:
    return f"CASE WHEN starts_with({msgcol}, ' ') THEN '' ELSE ' ' END"


def _grok_sql(src: str) -> str:
    """Generate the grok_parse oracle from the SAME compiled rulebase the
    engine runs (stages/normalize.py) — both sides are RE2, so embedding
    the engine's anchored regexes in regexp_matches/regexp_extract gives
    identical match + capture semantics by construction."""
    from ..stages.normalize import RuleBase
    from .queries import TRANSCRIPT_RULEBASE
    rb = RuleBase.from_string(TRANSCRIPT_RULEBASE)

    m_parts, g_parts = [], []
    for i, r in enumerate(rb.rules):
        pat = r.regex.replace("'", "''")
        m_parts.append(f"regexp_matches(s, '{pat}') AS m{i}")
        if r.fields:
            names = ", ".join(f"'f{j}'" for j in range(len(r.fields)))
            g_parts.append(f"regexp_extract(s, '{pat}', [{names}]) AS g{i}")
    ri_case = ("CASE "
               + " ".join(f"WHEN m{i} THEN {i}"
                          for i in range(len(rb.rules)))
               + " ELSE -1 END")
    tag_case = ("CASE "
                + " ".join(f"WHEN ri = {i} THEN '{r.tag}'"
                           for i, r in enumerate(rb.rules))
                + " ELSE '' END")

    field_sel = []
    for fname, ftype in rb.all_fields():
        whens = []
        for i, r in enumerate(rb.rules):
            if fname in r.fields:
                j = r.fields.index(fname)
                whens.append(f"WHEN ri = {i} THEN g{i}.f{j}")
            else:
                for tag, pairs in rb.annotations.items():
                    if tag == r.tag:
                        for af, av in pairs:
                            if af == fname:
                                whens.append(
                                    f"WHEN ri = {i} THEN '{av}'")
        expr = "CASE " + " ".join(whens) + " END"
        if ftype == "number":
            expr = f"CAST({expr} AS BIGINT)"
        elif ftype == "float":
            expr = f"CAST({expr} AS DOUBLE)"
        field_sel.append(f'{expr} AS "{fname}"')

    return f"""
WITH src AS (
  SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, text AS s
  FROM read_parquet('{src}')
),
m AS (
  SELECT *, {", ".join(m_parts + g_parts)} FROM src
),
sel AS (
  SELECT *, {ri_case} AS ri FROM m
)
SELECT conv_id, turn_idx,
  {tag_case} AS event_tag,
  ri >= 0 AS parse_success,
  {", ".join(field_sel)},
  CASE WHEN ri < 0 THEN s END AS unparsed_data
FROM sel"""


def build_oracle_sql(src: str = TRANSCRIPTS_GLOB) -> dict[str, str]:
    pc_ = _parse_cte(src)
    q: dict[str, str] = {}

    q["parse_fields"] = pc_ + """
SELECT conv_id, turn_idx, pri, facility, severity, protocol, parse_success,
       hostname, tag, appname, procid, msgid, structured_data, msg
FROM parsed"""

    q["parse_timestamps"] = pc_ + """
SELECT conv_id, turn_idx, protocol, ts_reported FROM parsed"""

    q["route_errors"] = pc_ + "," + _CEE + "," + _ALIVE + f"""
SELECT conv_id, turn_idx,
  '<' || CAST(pri AS VARCHAR) || '>' || strftime(ts_reported, {_RFC3339_FMT})
  || ' ' || hostname || ' ' || substr(syslogtag, 1, 32)
  || {_sp('msg')} || msg AS rendered
FROM alive WHERE severity <= 3"""

    q["route_files"] = pc_ + "," + _CEE + "," + _ALIVE + f"""
SELECT conv_id, turn_idx,
  strftime(ts_reported, {_RFC3339_FMT}) || ' ' || hostname || ' '
  || syslogtag || {_sp('msg')}
  || regexp_replace(msg, '\\n$', '') || chr(10) AS rendered
FROM alive WHERE msg LIKE '%msgnum:%' AND facility BETWEEN 16 AND 23"""

    q["route_cee"] = pc_ + "," + _CEE + "," + _ALIVE + f"""
SELECT conv_id, turn_idx,
  '{{"ts":"' || strftime(ts_reported, {_RFC3339_FMT}) || '","host":"'
  || {_jesc('hostname')} || '","tag":"' || {_jesc('syslogtag')}
  || '","role":"' || {_jesc('role')} || '","cee":' || cee_payload || '}}'
  AS rendered
FROM alive WHERE is_cee AND cee_parsesuccess"""

    q["agg_fac_sev"] = pc_ + "," + _CEE + "," + _ALIVE + """
SELECT facility, severity, count(*) AS "rows" FROM alive
GROUP BY facility, severity"""

    q["conv_rollup"] = pc_ + """
SELECT conv_id, count(*) AS n_turns,
       CAST(sum(CAST(parse_success AS BIGINT)) AS BIGINT) AS n_parsed_ok,
       min(ts) AS first_ts, max(ts) AS last_ts
FROM parsed GROUP BY conv_id"""

    q["lookup_enrich"] = f"""
SELECT role,
  CASE role WHEN 'user' THEN 'local0' WHEN 'assistant' THEN 'local1'
            WHEN 'system' THEN 'daemon' WHEN 'tool' THEN 'local7'
            ELSE 'unknown' END AS role_fac,
  tool,
  CASE tool WHEN 'bash' THEN 'exec' WHEN 'search' THEN 'net'
            WHEN 'editor' THEN 'fs' WHEN '' THEN 'none'
            ELSE 'unclassified' END AS tool_class,
  count(*) AS "rows"
FROM read_parquet('{src}')
GROUP BY 1, 2, 3, 4"""

    # sparseArray (greatest index <= key): 0→crit, 4→warn, 6→info
    q["sev_bucket"] = pc_ + "," + _CEE + "," + _ALIVE + """
SELECT severity,
  CASE WHEN severity >= 6 THEN 'info' WHEN severity >= 4 THEN 'warn'
       WHEN severity >= 0 THEN 'crit' ELSE 'na' END AS bucket,
  count(*) AS "rows"
FROM alive GROUP BY 1, 2"""

    _prof_cols = ["conv_id", "turn_idx", "role", "tool", "ts"]
    q["profile"] = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS "column", count(*) AS n_rows,
  count(*) - count({c}) AS n_nulls,
  count(DISTINCT {c}) AS n_distinct FROM read_parquet('{src}')"""
        for c in _prof_cols)

    q["turn_windows"] = f"""
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
  string_agg(text, chr(10)) OVER (PARTITION BY conv_id ORDER BY turn_idx
    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS context
FROM read_parquet('{src}')"""

    q["sft_pairs"] = f"""
WITH w AS (
  SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role, text,
    max(CASE WHEN role = 'user' THEN CAST(turn_idx AS BIGINT) END)
      OVER (PARTITION BY conv_id ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS prompt_turn_idx,
    last_value(CASE WHEN role = 'user' THEN text END IGNORE NULLS)
      OVER (PARTITION BY conv_id ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prompt
  FROM read_parquet('{src}')
)
SELECT conv_id, prompt_turn_idx, turn_idx AS response_turn_idx,
       prompt, text AS response
FROM w WHERE role = 'assistant' AND prompt_turn_idx IS NOT NULL"""

    q["set_vars"] = f"""
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
  upper(role) || '|' ||
  CASE WHEN role = 'system' THEN ''
       ELSE CAST(length(text) AS VARCHAR) END || '|' ||
  CASE WHEN tool IS NOT NULL AND tool <> '' THEN 'tool_' || tool
       ELSE '' END AS rendered
FROM read_parquet('{src}')"""

    q["suppress_repeats"] = f"""
WITH w AS (
  SELECT conv_id, turn_idx, text,
    CASE WHEN lag(text) OVER (PARTITION BY conv_id ORDER BY turn_idx)
              IS DISTINCT FROM text THEN 1 ELSE 0 END AS is_first
  FROM read_parquet('{src}')
),
runs AS (
  SELECT conv_id, turn_idx,
    sum(is_first) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS run_id
  FROM w
)
SELECT conv_id, min(turn_idx) AS turn_idx, count(*) AS n_repeats
FROM runs GROUP BY conv_id, run_id"""

    q["every_nth"] = f"""
WITH w AS (
  SELECT conv_id, turn_idx,
    row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM read_parquet('{src}')
)
SELECT conv_id, turn_idx FROM w WHERE (rn - 1) % 3 = 0"""

    q["strfun"] = """
SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
       lower(substr(text, 1, 8)) AS lower8,
       CASE WHEN length(text) - length(replace(text, ' ', '')) >= 1
            THEN split_part(text, ' ', 2) ELSE '***FIELD NOT FOUND***' END AS field2,
       replace(substr(text, 1, 12), 'e', '_') AS replaced
FROM documents"""

    q["dedup_exact"] = """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"""

    q["token_stats"] = r"""
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish
FROM documents"""

    q["events_window"] = """
SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS "rows",
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS value_sum
FROM events GROUP BY 1, 2"""

    q["hopping_window"] = """
WITH e AS (
  SELECT event_type, value, epoch_us(ts) // 1000000 AS tss FROM events
),
w AS (
  SELECT event_type, value,
    unnest(generate_series((tss - 3600) // 900 * 900 + 900,
                           tss // 900 * 900, 900)) AS wstart
  FROM e
)
SELECT event_type, CAST(wstart AS BIGINT) AS wstart,
       count(*) AS "rows",
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS value_sum
FROM w GROUP BY 1, 2"""

    q["head_per_conv"] = f"""
SELECT conv_id, turn_idx, role FROM (
  SELECT conv_id, turn_idx, role,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM read_parquet('{src}'))
WHERE rn <= 2"""

    q["range_join"] = """
SELECT e.event_id, e.user_id, e.ts, s.start_ts, s.end_ts
FROM events e JOIN (
  SELECT user_id, ts AS start_ts, ts + INTERVAL 1 HOUR AS end_ts
  FROM events WHERE event_type = 'signup') s
ON e.user_id = s.user_id
   AND e.ts >= s.start_ts AND e.ts <= s.end_ts"""

    q["topk_tools"] = f"""
SELECT role, tool, "rows", rank FROM (
  SELECT role, tool, count(*) AS "rows",
         CAST(row_number() OVER (PARTITION BY role
              ORDER BY count(*) DESC, tool) AS BIGINT) AS rank
  FROM read_parquet('{src}') WHERE tool IS NOT NULL
  GROUP BY role, tool)
WHERE rank <= 3"""

    q["asof_join"] = """
SELECT e.event_id, e.user_id, e.ts, s.ts AS ts_r
FROM events e ASOF JOIN
     (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
  ON e.user_id = s.user_id AND e.ts >= s.ts"""

    q["asof_tolerance"] = """
SELECT e.event_id, e.user_id, e.ts,
  (SELECT max(s.ts) FROM events s
   WHERE s.event_type = 'signup' AND s.user_id = e.user_id
     AND s.ts <= e.ts
     AND s.ts >= e.ts - INTERVAL 7 DAY) AS ts_r
FROM events e
WHERE (SELECT max(s.ts) FROM events s
       WHERE s.event_type = 'signup' AND s.user_id = e.user_id
         AND s.ts <= e.ts
         AND s.ts >= e.ts - INTERVAL 7 DAY) IS NOT NULL"""

    q["log_templates"] = pc_ + "," + _CEE + "," + _ALIVE + """
SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(msg, '[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}', '<uuid>', 'g'), '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<ip>', 'g'), '\\b0x[0-9a-fA-F]+\\b', '<hex>', 'g'), '\\d+', '<n>', 'g') AS template, count(*) AS "rows" FROM alive
GROUP BY 1"""

    q["mad_outliers"] = """
WITH med AS (
  SELECT event_type, quantile_disc(value, 0.5) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type,
         quantile_disc(round(abs(e.value - m.med), 2), 0.5) AS mad
  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type
)
SELECT e.event_id, e.event_type, e.value
FROM events e JOIN med USING (event_type) JOIN mad USING (event_type)
WHERE abs(e.value - med.med) > 3.0 * mad.mad"""

    q["rollup"] = pc_ + "," + _CEE + "," + _ALIVE + """
SELECT facility, severity, count(*) AS "rows" FROM alive
GROUP BY ROLLUP (facility, severity)"""

    q["events_props"] = """
SELECT event_type, count(*) AS "rows",
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_sum
FROM events GROUP BY 1"""

    q["distinct_users"] = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY 1"""

    q["percentiles"] = """
SELECT event_type,
       quantile_disc(value, 0.5)  AS p50,
       quantile_disc(value, 0.95) AS p95,
       quantile_disc(value, 0.99) AS p99
FROM events GROUP BY 1"""

    q["sessionize"] = """
WITH w AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
           OR (epoch_us(ts) // 1000000)
              - (epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                 // 1000000) > 600
         THEN 1 ELSE 0 END AS new_s
  FROM events
),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid
  FROM w
)
SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
       count(*) AS n_events, min(ts) AS start_ts, max(ts) AS end_ts
FROM s GROUP BY user_id, sid"""

    q["mmfields"] = """
WITH s AS (
  SELECT doc_id, text, length(string_split(text, ' ')) AS nf FROM documents
)
SELECT doc_id,
  CASE WHEN nf >= 1 THEN split_part(text, ' ', 1) END AS f1,
  CASE WHEN nf >= 2 THEN split_part(text, ' ', 2) END AS f2,
  CASE WHEN nf >= 3 THEN split_part(text, ' ', 3) END AS f3,
  CASE WHEN nf >= 4 THEN split_part(text, ' ', 4) END AS f4,
  CASE WHEN nf >= 5 THEN split_part(text, ' ', 5) END AS f5
FROM s"""

    q["mmanon"] = r"""
SELECT doc_id,
  regexp_replace(
    'src=' || CAST(1 + doc_id % 223 AS VARCHAR) || '.'
           || CAST(doc_id % 191 AS VARCHAR) || '.'
           || CAST(doc_id % 157 AS VARCHAR) || '.'
           || CAST(doc_id % 119 AS VARCHAR)
    || ' dst=10.0.' || CAST(doc_id % 250 AS VARCHAR) || '.7 '
    || substr(text, 1, 16),
    '(25[0-5]|2[0-4]\d|[01]?\d?\d)\.(25[0-5]|2[0-4]\d|[01]?\d?\d)\.(25[0-5]|2[0-4]\d|[01]?\d?\d)\.(25[0-5]|2[0-4]\d|[01]?\d?\d)',
    '\1.\2.0.0', 'g') AS line
FROM documents"""

    # zero12: (ip >> 12) << 12 via integer arithmetic on the octets the
    # line was synthesized from; simple16: digits of the last two octets
    # overwritten with 'x' preserving text layout (mmanon.c simpleAnon)
    q["mmanon_modes"] = """
WITH b AS (
  SELECT doc_id,
    1 + doc_id % 223 AS o1, doc_id % 191 AS o2,
    doc_id % 157 AS o3, doc_id % 119 AS o4,
    doc_id % 250 AS e3,
    substr(text, 1, 16) AS tail
  FROM documents
),
z AS (
  SELECT *,
    ((o1*16777216 + o2*65536 + o3*256 + o4) // 4096) * 4096 AS z1,
    ((10*16777216 + e3*256 + 7) // 4096) * 4096 AS z2
  FROM b
)
SELECT doc_id,
  'src=' || CAST(z1 // 16777216 % 256 AS VARCHAR) || '.'
         || CAST(z1 // 65536 % 256 AS VARCHAR) || '.'
         || CAST(z1 // 256 % 256 AS VARCHAR) || '.'
         || CAST(z1 % 256 AS VARCHAR)
  || ' dst=' || CAST(z2 // 16777216 % 256 AS VARCHAR) || '.'
             || CAST(z2 // 65536 % 256 AS VARCHAR) || '.'
             || CAST(z2 // 256 % 256 AS VARCHAR) || '.'
             || CAST(z2 % 256 AS VARCHAR)
  || ' ' || tail AS zero12,
  'src=' || CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.'
         || repeat('x', length(CAST(o3 AS VARCHAR))) || '.'
         || repeat('x', length(CAST(o4 AS VARCHAR)))
  || ' dst=10.0.' || repeat('x', length(CAST(e3 AS VARCHAR))) || '.x'
  || ' ' || tail AS simple16
FROM z"""

    # exec_interval: the transcripts fixture spaces consecutive turns of a
    # conv EXACTLY 1 s apart (datagen.py: ts = BASE + seq·1s with convs
    # contiguous in seq), so "≥45 s since last emission" reduces to every
    # 45th turn. The general sequential semantics are pinned by the Python
    # oracle in tests/test_ratelimit.py; this SQL is the driver-side
    # equivalence ON THIS DATA.
    q["exec_interval"] = f"""
WITH w AS (
  SELECT conv_id, turn_idx,
    row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM read_parquet('{src}')
)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx
FROM w WHERE (rn - 1) % 45 = 0"""

    # element pattern is the engine's _SD_ELEM verbatim (group 0 = whole
    # element); params are extracted twice (names, values) and unnested in
    # lockstep; unescape order matches parse_structured_data exactly
    sd_elem = (r"\[([^\s\]]+)((?:\s+[^=\s\]]+=" + '"'
               + r"(?:[^" + '"' + r"\\]|\\.)*" + '"' + r")*)\]")
    sd_param = r'([^=\s\]]+)="((?:[^"\\]|\\.)*)"'
    q["sd_params"] = pc_ + f""",
sd1 AS (
  SELECT conv_id, turn_idx, structured_data FROM parsed
  WHERE protocol = 1 AND structured_data NOT IN ('-', '')
),
sd2 AS (
  SELECT conv_id, turn_idx,
    unnest(regexp_extract_all(structured_data, '{sd_elem}', 0)) AS elem
  FROM sd1
),
sd3 AS (
  SELECT conv_id, turn_idx,
    regexp_extract(elem, '^\\[([^\\s\\]]+)', 1) AS sd_id,
    regexp_extract_all(elem, '{sd_param}', 1) AS pnames,
    regexp_extract_all(elem, '{sd_param}', 2) AS pvals
  FROM sd2
),
sd4 AS (
  SELECT conv_id, turn_idx, sd_id,
         unnest(pnames) AS pname, unnest(pvals) AS praw
  FROM sd3
)
SELECT conv_id, turn_idx, sd_id, pname,
  replace(replace(replace(praw, '\\"', '"'), '\\]', ']'),
          '\\\\', '\\') AS pvalue
FROM sd4"""

    q["dynstats_tool"] = f"""
SELECT tool AS key, count(*) AS "rows", 'tools' AS bucket
FROM read_parquet('{src}') GROUP BY tool"""

    q["rate_window"] = f"""
WITH b AS (
  SELECT conv_id, turn_idx, epoch_us(ts) // 1000000 AS tss,
    first_value(epoch_us(ts) // 1000000)
      OVER (PARTITION BY conv_id ORDER BY turn_idx) AS t0
  FROM read_parquet('{src}')
),
r AS (
  SELECT conv_id, turn_idx,
    row_number() OVER (PARTITION BY conv_id, ((tss - t0) // 60)
                       ORDER BY turn_idx) AS rn
  FROM b
)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx FROM r WHERE rn <= 5"""

    # secpath-replace on hostname: '/'→'_', then ''→'_', '.'→'_', '..'→'_.'
    _secpath_h = ("CASE replace(hostname, '/', '_') WHEN '' THEN '_' "
                  "WHEN '.' THEN '_' WHEN '..' THEN '_.' "
                  "ELSE replace(hostname, '/', '_') END")
    q["template_opts"] = pc_ + f"""
SELECT conv_id, turn_idx,
  upper(hostname) || '|' || substr(msg, 2, 11) || '|'
  || CASE WHEN length(msg) - length(replace(msg, ':', '')) >= 1
          THEN split_part(msg, ':', 2) ELSE '***FIELD NOT FOUND***' END
  || '|' || CAST(epoch_us(ts_reported) // 1000000 AS VARCHAR)
  || '|' || regexp_extract(msg, 'msgnum.([0-9]+)', 1)
  || '|' || rpad(substr(msg, 1, 6), 6, ' ')
  || '|' || right(msg, 4)
  || '|' || strftime(ts_reported, '%Y%m%d%H%M%S')
  || '|' || strftime(ts_reported, '%a')
  || '|' || {_secpath_h} AS rendered
FROM parsed"""

    _FACS = ("['kern','user','mail','daemon','auth','syslog','lpr','news',"
             "'uucp','cron','authpriv','ftp','ntp','audit','alert','clock',"
             "'local0','local1','local2','local3','local4','local5',"
             "'local6','local7']")
    _SEVS = ("['emerg','alert','crit','err','warning','notice','info',"
             "'debug']")
    q["properties"] = pc_ + f"""
SELECT conv_id, turn_idx,
  list_extract({_FACS}, CAST(facility AS INTEGER) + 1) AS fac_text,
  list_extract({_SEVS}, CAST(severity AS INTEGER) + 1) AS sev_text,
  list_extract({_FACS}, CAST(facility AS INTEGER) + 1) || '.'
    || list_extract({_SEVS}, CAST(severity AS INTEGER) + 1) AS pri_text,
  strftime(ts, '%Y-%m-%d') AS now_day,
  CAST(minute(ts) // 30 AS VARCHAR) AS hhour,
  CAST(minute(ts) // 15 AS VARCHAR) AS qhour,
  CAST(dayofweek(ts) AS VARCHAR) AS wday,
  '127.0.0.1' AS fromhost_ip,
  'imfile' AS inputname
FROM parsed"""

    q["prifilt"] = pc_ + """
SELECT conv_id, turn_idx FROM parsed
WHERE facility BETWEEN 16 AND 19 AND severity <= 4"""

    q["quality"] = r"""
WITH w AS (
  SELECT doc_id, text,
    regexp_extract_all(lower(text), '[a-z]+') AS words,
    greatest(length(text), 1) AS n_chars
  FROM documents
),
x AS (
  SELECT doc_id, text, words, n_chars,
         greatest(length(words), 1) AS n_words FROM w
)
SELECT doc_id,
  round(CAST(length(list_filter(words, w -> list_contains(
    ['the','and','of','a','to','in','is','it','that','for','on','with',
     'as','was','at','by','an','be'], w))) AS DOUBLE) / n_words, 6)
    AS stop_ratio,
  round(coalesce(list_avg(list_transform(words,
    w -> CAST(length(w) AS DOUBLE))), 0.0), 6) AS mean_word_len,
  round(CAST(length(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
             AS DOUBLE) / n_chars, 6) AS punct_ratio,
  round(CAST(length(regexp_extract_all(text, '[0-9]'))
             AS DOUBLE) / n_chars, 6) AS digit_ratio
FROM x"""

    q["langid"] = """
WITH w AS (
  SELECT doc_id,
    list_distinct(regexp_extract_all(lower(text),
                                     '[a-záéíóúüäöñç]+')) AS ws
  FROM documents
),
c AS (
  SELECT doc_id,
    length(list_filter(ws, x -> list_contains(
      ['the','and','of','to','in','is','you','that','it'], x))) AS n_en,
    length(list_filter(ws, x -> list_contains(
      ['der','die','das','und','ist','nicht','ich','ein'], x))) AS n_de,
    length(list_filter(ws, x -> list_contains(
      ['le','la','les','et','est','pas','je','une','que'], x))) AS n_fr,
    length(list_filter(ws, x -> list_contains(
      ['el','la','los','y','es','no','una','que','por'], x))) AS n_es
  FROM w
)
SELECT doc_id,
  CASE
    WHEN n_en >= 2 AND n_en >= n_de AND n_en >= n_fr AND n_en >= n_es
      THEN 'en'
    WHEN n_de >= 2 AND n_de > n_en AND n_de >= n_fr AND n_de >= n_es
      THEN 'de'
    WHEN n_fr >= 2 AND n_fr > n_en AND n_fr > n_de AND n_fr >= n_es
      THEN 'fr'
    WHEN n_es >= 2 AND n_es > n_en AND n_es > n_de AND n_es > n_fr
      THEN 'es'
    ELSE 'unknown' END AS lang_pred
FROM c"""

    q["parse_json"] = pc_ + "," + _CEE + """
SELECT conv_id, turn_idx,
  json_extract_string(cee_payload, '$.event') AS event,
  CAST(json_extract_string(cee_payload, '$.n') AS BIGINT) AS n
FROM cee WHERE cee_parsesuccess"""

    # script_error(): rows whose (deterministically half-corrupted) JSON
    # fails to parse — engine routes them via the errno expr op; the
    # oracle applies the IDENTICAL corruption and DuckDB JSON validation
    q["script_error"] = pc_ + "," + _CEE + """
SELECT conv_id, turn_idx FROM cee
WHERE cee_parsesuccess
  AND TRY_CAST(
        CASE WHEN turn_idx % 2 = 0 THEN cee_payload || '}'
             ELSE cee_payload END AS JSON) IS NULL"""

    from ..stages.sampling import (sample_threshold_sql,  # noqa: PLC0415
                                   split_cut_sql)
    q["hash_split"] = f"""
SELECT doc_id, source, {split_cut_sql()} AS split FROM documents"""

    q["sample_by_source"] = ("SELECT doc_id, source, lang FROM documents "
                             "WHERE " + sample_threshold_sql(
                                 {"src0": 0.5, "src1": 0.25, "src2": 0.0}))

    q["pack_sequences"] = r"""
WITH t AS (
  SELECT doc_id, source AS "group",
         CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, "group", n_tokens,
  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY "group" ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048
    AS BIGINT) AS seq_idx
FROM t ORDER BY doc_id"""

    from ..stages.sampling import SAMPLE_N_PRIME  # noqa: PLC0415
    q["sample_n_per_source"] = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY
           (CAST(doc_id AS HUGEINT) * {SAMPLE_N_PRIME}) %
           {1 << 64}) AS rn
  FROM documents)
WHERE rn <= 5"""

    q["top_ngrams"] = r"""
WITH w AS (
  SELECT regexp_extract_all(text, '\S+') AS ws FROM documents
),
starts AS (
  SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
  FROM w WHERE len(ws) >= 2
),
c AS (
  SELECT array_to_string(ws[i:i+1], ' ') AS gram, count(*) AS cnt
  FROM starts GROUP BY 1
)
SELECT gram, CAST(cnt AS BIGINT) AS cnt FROM c
ORDER BY cnt DESC, gram LIMIT 50"""

    q["repetition"] = """
WITH l AS (
  SELECT doc_id, string_split(text, ' ') AS ls FROM documents
),
e AS (
  SELECT doc_id, unnest(generate_series(1, len(ls))) AS i, ls FROM l
),
k AS (
  SELECT doc_id, i, ls[i] AS line,
         row_number() OVER (PARTITION BY doc_id, ls[i] ORDER BY i) AS rn
  FROM e
)
SELECT doc_id,
  round(CAST(count(*) FILTER (rn > 1) AS DOUBLE)
        / greatest(count(*), 1), 6) AS dup_line_frac,
  round(CAST(coalesce(sum(length(line)) FILTER (rn > 1), 0) AS DOUBLE)
        / greatest(sum(length(line)), 1), 6) AS dup_char_frac
FROM k GROUP BY doc_id"""

    q["curation"] = r"""
WITH q AS (
  SELECT doc_id, text,
    round(CAST(length(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
      w -> list_contains(
        ['the','and','of','a','to','in','is','it','that','for','on','with',
         'as','was','at','by','an','be'], w))) AS DOUBLE)
      / greatest(length(regexp_extract_all(lower(text), '[a-z]+')), 1), 6)
      AS stop_ratio
  FROM documents
),
f AS (SELECT doc_id, text FROM q WHERE stop_ratio >= 0.05),
d AS (SELECT min(doc_id) AS doc_id, text FROM f GROUP BY text),
l AS (SELECT doc_id, string_split(text, ' ') AS ls FROM d),
e AS (SELECT doc_id, unnest(generate_series(1, len(ls))) AS i, ls FROM l),
k AS (SELECT doc_id, i, ls[i] AS line,
             row_number() OVER (PARTITION BY doc_id, ls[i] ORDER BY i) AS rn
      FROM e),
c AS (SELECT doc_id, string_agg(line, ' ' ORDER BY i) AS text
      FROM k WHERE rn = 1 GROUP BY doc_id)
SELECT doc_id, {split} AS split,
  CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
FROM c""".replace("{split}", split_cut_sql())

    q["dedup_lines"] = """
WITH l AS (
  SELECT doc_id, string_split(text, ' ') AS ls FROM documents
),
e AS (
  SELECT doc_id, unnest(generate_series(1, len(ls))) AS i, ls FROM l
),
k AS (
  SELECT doc_id, i, ls[i] AS line,
         row_number() OVER (PARTITION BY doc_id, ls[i] ORDER BY i) AS rn
  FROM e
)
SELECT doc_id, string_agg(line, ' ' ORDER BY i) AS text
FROM k WHERE rn = 1 GROUP BY doc_id"""

    q["decontaminate"] = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
),
starts AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS i
  FROM w WHERE len(ws) >= 5
),
grams AS (
  SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS g FROM starts
),
eval_g AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 0
)
SELECT doc_id FROM documents d
WHERE doc_id % 20 <> 0
  AND NOT EXISTS (SELECT 1 FROM grams t JOIN eval_g e ON t.g = e.g
                  WHERE t.doc_id = d.doc_id)"""

    from ..stages.sampling import token_budget_sql  # noqa: PLC0415
    q["token_budget"] = token_budget_sql(
        {"src0": 3000, "src1": 1500}, default_budget=800)

    from ..stages.sampling import sample_global_n_sql  # noqa: PLC0415
    q["sample_global"] = sample_global_n_sql(100)

    from ..stages.textstats import blocklist_sql  # noqa: PLC0415
    from .queries import BLOCKLIST  # noqa: PLC0415
    q["blocklist"] = ("SELECT doc_id, source FROM documents WHERE "
                      + blocklist_sql(BLOCKLIST))

    q["dup_ngrams"] = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
),
starts AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS i
  FROM w WHERE len(ws) >= 5
),
grams AS (
  SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS g FROM starts
),
df AS (
  SELECT g, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY g
),
per AS (
  SELECT grams.doc_id, COUNT(*) AS total,
         SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS dup
  FROM grams JOIN df USING (g) GROUP BY grams.doc_id
)
SELECT d.doc_id,
  COALESCE(round(CAST(per.dup AS DOUBLE) / per.total, 6), 0.0) AS dup_frac
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id"""

    q["dedup_spans"] = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
),
toks AS (
  SELECT doc_id, unnest(ws) AS tok, generate_subscripts(ws, 1) AS pos
  FROM w
),
starts AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS i
  FROM w WHERE len(ws) >= 5
),
grams AS (
  SELECT doc_id, i, array_to_string(ws[i:i+4], ' ') AS g FROM starts
),
dups AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 2
),
cov AS (
  SELECT DISTINCT doc_id, cpos FROM (
    SELECT grams.doc_id, unnest(generate_series(i, i + 4)) AS cpos
    FROM grams JOIN dups USING (g))
),
kept AS (
  SELECT t.doc_id, t.tok, t.pos
  FROM toks t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.cpos = t.pos
  WHERE c.doc_id IS NULL
),
tt AS (SELECT doc_id, COUNT(*) AS m FROM toks GROUP BY doc_id),
kk AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS cleaned,
              COUNT(*) AS kc
       FROM kept GROUP BY doc_id)
SELECT w.doc_id,
  COALESCE(kk.cleaned, '') AS cleaned,
  COALESCE(tt.m, 0) AS n_tokens,
  COALESCE(tt.m, 0) - COALESCE(kk.kc, 0) AS n_removed
FROM w LEFT JOIN tt USING (doc_id) LEFT JOIN kk USING (doc_id)"""

    q["decontaminate_frac"] = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
),
starts AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS i
  FROM w WHERE len(ws) >= 5
),
grams AS (
  SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS g FROM starts
),
eval_g AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 0
),
ov AS (
  SELECT grams.doc_id, COUNT(*) AS total,
         SUM(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END) AS hits
  FROM grams LEFT JOIN eval_g e USING (g)
  WHERE grams.doc_id % 20 <> 0
  GROUP BY grams.doc_id
)
SELECT d.doc_id FROM documents d
LEFT JOIN ov ON d.doc_id = ov.doc_id
WHERE d.doc_id % 20 <> 0
  AND COALESCE(CAST(ov.hits AS DOUBLE) / ov.total, 0.0) < 0.2"""

    q["foreach_list"] = """
SELECT vec_id,
  CAST(unnest(generate_series(1, len(embedding))) AS BIGINT) AS idx,
  round(CAST(unnest(embedding) AS DOUBLE), 6) AS val
FROM embeddings"""

    q["foreach_obj"] = pc_ + "," + _CEE + """,
k AS (
  SELECT conv_id, turn_idx, cee_payload,
         unnest(json_keys(cee_payload)) AS key
  FROM cee WHERE cee_parsesuccess
)
SELECT conv_id, turn_idx, key,
  json_extract_string(cee_payload, '$."' || key || '"') AS value
FROM k"""

    q["grok_parse"] = _grok_sql(src)

    # word-trigram Jaccard: the engine hashes grams (64-bit, collision
    # probability negligible at oracle scale) — intersection/size counts
    # and the final int÷int double division match bit-exactly
    q["jaccard_pairs"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) s
  WHERE len(t) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.a, i.b, CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) AS jaccard
FROM inter i JOIN sizes sa ON sa.doc_id = i.a
             JOIN sizes sb ON sb.doc_id = i.b
WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.4"""

    q["editdist_pairs"] = r"""
WITH k AS (SELECT doc_id, substr(text, 1, 24) AS key FROM documents)
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
FROM k a JOIN k b ON a.doc_id < b.doc_id
WHERE levenshtein(a.key, b.key) <= 1"""

    q["dict_encode"] = """
WITH v AS (
  SELECT event_type,
         dense_rank() OVER (ORDER BY event_type) AS event_type_id
  FROM (SELECT DISTINCT event_type FROM events)
)
SELECT e.event_id, e.event_type, CAST(v.event_type_id AS BIGINT)
  AS event_type_id
FROM events e JOIN v USING (event_type)"""

    q["winsorize"] = """
WITH b AS (
  SELECT event_type,
         quantile_disc(value, 0.05) AS lo,
         quantile_disc(value, 0.95) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_id, least(greatest(e.value, b.lo), b.hi) AS clipped
FROM events e JOIN b USING (event_type)"""

    q["feature_corr"] = r"""
WITH f AS (
  SELECT CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(regexp_split_to_array(text, '\s+')) AS DOUBLE)
           AS n_words,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
           AS n_digits
  FROM documents
)
SELECT 'n_chars' AS feature_a, 'n_words' AS feature_b,
       round(corr(n_chars, n_words), 6) AS corr FROM f
UNION ALL
SELECT 'n_chars', 'n_digits', round(corr(n_chars, n_digits), 6) FROM f
UNION ALL
SELECT 'n_words', 'n_digits', round(corr(n_words, n_digits), 6) FROM f"""

    q["editdist_dedup"] = r"""
WITH k AS (SELECT doc_id, substr(text, 1, 24) AS key FROM documents)
SELECT d.doc_id FROM k d
WHERE NOT EXISTS (
  SELECT 1 FROM k o
  WHERE o.doc_id < d.doc_id AND levenshtein(o.key, d.key) <= 1)"""

    q["neardup_clusters"] = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) s
  WHERE len(t) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.a, i.b
  FROM inter i JOIN sizes sa ON sa.doc_id = i.a
               JOIN sizes sb ON sb.doc_id = i.b
  WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.4
),
edges AS (SELECT a AS u, b AS v FROM pairs
          UNION ALL SELECT b, a FROM pairs),
reach AS (
  SELECT doc_id AS node, doc_id AS r FROM documents
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
)
SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node"""

    # dedup audit histogram over the same transitive closure
    q["dedup_report"] = (
        q["neardup_clusters"].replace(
            "SELECT node AS doc_id, min(r) AS cluster_id "
            "FROM reach GROUP BY node",
            """clus AS (SELECT node AS doc_id, min(r) AS cluster_id
         FROM reach GROUP BY node),
sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       FROM clus GROUP BY cluster_id)
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM sz GROUP BY cluster_size ORDER BY cluster_size"""))
    # splice: the replacement turns the final SELECT into a CTE, so the
    # 'reach AS (...)' list needs the extra comma
    q["dedup_report"] = q["dedup_report"].replace(
        ")\nclus AS", "),\nclus AS")

    q["jaccard_dedup"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) s
  WHERE len(t) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS c
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
dropped AS (
  SELECT DISTINCT i.b FROM inter i
  JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
  WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.4
)
SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT b FROM dropped)"""

    q["cosine_dedup"] = """
SELECT e.vec_id FROM embeddings e
WHERE NOT EXISTS (
  SELECT 1 FROM embeddings a
  WHERE a.vec_id < e.vec_id
    AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(e.embedding AS DOUBLE[])) >= 0.4)"""

    q["neardup_pairs"] = """
SELECT a.vec_id AS a, b.vec_id AS b,
  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])), 6) AS score
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.4"""

    q["topk_cosine"] = """
WITH qv AS (
  SELECT embedding FROM embeddings
  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
)
SELECT vec_id, round(score, 6) AS score FROM (
  SELECT e.vec_id,
    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                           CAST(qv.embedding AS DOUBLE[])) AS score
  FROM embeddings e, qv
) ORDER BY score DESC, vec_id LIMIT 20"""

    from ..stages.enrich import redact_sql  # noqa: PLC0415
    q["redact"] = f"""
SELECT conv_id, turn_idx, {redact_sql('text')} AS text
FROM read_parquet('{src}')"""

    q["canonical_dedup"] = """
SELECT min(doc_id) AS doc_id FROM documents
GROUP BY trim(regexp_replace(regexp_replace(lower(text),
         '[^a-z0-9\\s]+', '', 'g'), '\\s+', ' ', 'g'))"""

    from ..stages.sampling import epoch_mix_sql  # noqa: PLC0415
    q["epoch_mix"] = f"""
SELECT doc_id, source, g.epoch FROM (
  SELECT doc_id, source,
         {epoch_mix_sql({"src0": 2.3, "src1": 0.5})} AS copies
  FROM documents) d, range(0, 4) g(epoch)
WHERE g.epoch < d.copies"""

    q["immark"] = f"""
WITH b AS (SELECT epoch_us(min(ts)) // 1000000 AS lo,
                  epoch_us(max(ts)) // 1000000 AS hi
           FROM read_parquet('{src}')),
     g AS (SELECT unnest(generate_series(
               (SELECT (lo // 1200 + 1) * 1200 FROM b),
               (SELECT hi FROM b), 1200)) AS s)
SELECT make_timestamp(s * 1000000) AS ts,
       CAST(46 AS BIGINT) AS pri, 'rsyslogd:' AS tag, '-- MARK --' AS text
FROM g"""

    # `OR text IS NULL`: the engine's invert(is_in(hot_set)) keeps
    # null-text rows (null never matches a non-null hot line), while
    # bare `IN (subquery)` yields NULL for them and drops the row.
    q["boilerplate"] = f"""
SELECT conv_id, turn_idx FROM read_parquet('{src}')
WHERE text IS NULL OR text IN (
  SELECT text FROM read_parquet('{src}')
  GROUP BY text HAVING count(DISTINCT conv_id) < 2)"""

    q["dedup_lines_global"] = f"""
SELECT conv_id, turn_idx FROM (
  SELECT conv_id, turn_idx,
    row_number() OVER (PARTITION BY text ORDER BY conv_id, turn_idx) AS rn
  FROM read_parquet('{src}')
) WHERE rn = 1"""

    from ..stages.sampling import shuffle_sql  # noqa: PLC0415
    q["shuffle_shards"] = shuffle_sql(8, 42) + " FROM documents"

    q["equi_join"] = f"""
SELECT t.conv_id, CAST(t.turn_idx AS BIGINT) AS turn_idx, t.role,
       u.n_turns
FROM read_parquet('{src}') t
JOIN (SELECT conv_id, count(*) AS n_turns FROM read_parquet('{src}')
      GROUP BY conv_id) u USING (conv_id)"""

    q["conv_docs"] = f"""
SELECT conv_id,
       string_agg(text, chr(10) ORDER BY turn_idx) AS doc,
       count(*) AS n_turns,
       CAST(length(string_agg(text, chr(10) ORDER BY turn_idx)) AS BIGINT)
         AS n_chars
FROM read_parquet('{src}') GROUP BY conv_id"""

    q["conv_dedup"] = f"""
WITH d AS (
  SELECT conv_id, string_agg(text, chr(10) ORDER BY turn_idx) AS doc
  FROM read_parquet('{src}') GROUP BY conv_id
)
SELECT min(conv_id) AS conv_id FROM d GROUP BY doc"""

    from ..stages.aggregate import funnel_sql  # noqa: PLC0415
    q["funnel"] = funnel_sql(["view", "click", "purchase"])

    q["keyword_search"] = """
SELECT DISTINCT doc_id FROM documents
WHERE list_contains(regexp_extract_all(lower(text), '\\S+'), 'slow')"""

    from ..stages.sampling import chunk_sql  # noqa: PLC0415
    q["chunk_docs"] = chunk_sql(128, 96)

    q["zscore"] = """
WITH s AS (
  SELECT event_type, AVG(value) AS mu, STDDEV_POP(value) AS sd
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
  round((e.value - s.mu) / CASE WHEN s.sd > 0 THEN s.sd ELSE 1 END, 6) AS z
FROM events e JOIN s USING (event_type)
WHERE abs(e.value - s.mu) > 3 * s.sd"""

    q["global_topn"] = """
SELECT event_id, ts, user_id, event_type, value FROM events
ORDER BY value DESC, event_id LIMIT 100"""

    q["nfc_normalize"] = """
SELECT doc_id, nfc_normalize(replace(text, 'a', 'a' || chr(769)))
         AS text_nfc
FROM documents"""

    q["event_gaps"] = """
SELECT event_id, user_id, ts,
       LAG(ts) OVER w AS prev_ts,
       date_diff('microsecond', LAG(ts) OVER w, ts) AS gap_us
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""

    q["running_total"] = """
SELECT event_id, user_id, ts, value,
       round(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 6)
         AS running_total
FROM events"""

    q["anti_join"] = """
SELECT event_id, user_id, event_type FROM events
WHERE event_id NOT IN
      (SELECT event_id FROM events
       ORDER BY value DESC, event_id LIMIT 100)"""

    q["dow_pivot"] = """
SELECT event_type,
       """ + ",\n       ".join(
        f"count(*) FILTER (WHERE isodow(ts) = {d}) AS d{d}"
        for d in range(1, 8)) + """
FROM events GROUP BY event_type"""

    q["median_filter"] = """
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         quantile_disc(n_chars, 0.5) OVER (PARTITION BY source) AS med
  FROM documents) WHERE n_chars > med"""

    q["lm_score"] = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
),
tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
uni AS (SELECT word, count(*) AS c FROM tok GROUP BY 1),
v AS (SELECT count(*) AS v FROM uni),
starts AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
  FROM w WHERE len(ws) >= 2
),
big AS (SELECT doc_id, ws[i] AS prev,
               array_to_string(ws[i:i+1], ' ') AS gram FROM starts),
bc AS (SELECT gram, count(*) AS c FROM big GROUP BY 1),
scored AS (
  SELECT big.doc_id, ln((bc.c + 1.0) / (uni.c + v.v)) AS lp
  FROM big JOIN bc USING (gram)
           JOIN uni ON big.prev = uni.word CROSS JOIN v)
SELECT doc_id, round(avg(lp), 6) AS lm_score,
       CAST(count(*) AS BIGINT) AS n_bigrams
FROM scored GROUP BY doc_id"""

    q["user_ntile"] = """
SELECT event_id, user_id, value,
       CAST(NTILE(4) OVER (PARTITION BY user_id
                           ORDER BY value, event_id) AS BIGINT)
         AS quartile
FROM events"""

    q["type_rank"] = """
SELECT event_id, user_id, event_type,
       CAST(RANK() OVER (PARTITION BY user_id ORDER BY event_type)
            AS BIGINT) AS rnk
FROM events"""

    q["centroids"] = """
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       round(avg(v), 6) AS centroid
FROM (SELECT label,
             unnest(generate_series(1, len(embedding))) AS dim,
             unnest(embedding) AS v
      FROM embeddings)
GROUP BY 1, 2"""

    q["tfidf"] = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df
       FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, score FROM (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6)
                      DESC, tf.term) AS rn
  FROM tf JOIN df USING (term) CROSS JOIN n) WHERE rn <= 5"""

    from ..stages.dsir import dsir_score_sql
    q["dsir_score"] = dsir_score_sql(["src0", "src1"])
    q["dsir_sample"] = dsir_score_sql(["src0", "src1"], n=150)

    q["contamination_report"] = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
),
starts AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS i
  FROM w WHERE len(ws) >= 5
),
grams AS (
  SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS g FROM starts
),
evg AS (SELECT DISTINCT doc_id AS eval_id, g FROM grams
        WHERE doc_id % 20 = 0),
cg AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 20 <> 0),
hits AS (SELECT DISTINCT evg.eval_id, cg.doc_id FROM evg
         JOIN cg USING (g)),
hc AS (SELECT eval_id, COUNT(*) AS n FROM hits GROUP BY eval_id)
SELECT d.doc_id AS eval_id,
       CAST(COALESCE(hc.n, 0) AS BIGINT) AS n_contaminated
FROM documents d LEFT JOIN hc ON d.doc_id = hc.eval_id
WHERE d.doc_id % 20 = 0 ORDER BY eval_id"""

    from ..stages.sampling import temperature_mix_sql
    q["temperature_mix"] = temperature_mix_sql(alpha=0.3, frac=0.5)

    q["ccnet_buckets"] = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents
),
tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
uni AS (SELECT word, count(*) AS c FROM tok GROUP BY 1),
v AS (SELECT count(*) AS v FROM uni),
starts AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
  FROM w WHERE len(ws) >= 2
),
big AS (SELECT doc_id, ws[i] AS prev,
               array_to_string(ws[i:i+1], ' ') AS gram FROM starts),
bc AS (SELECT gram, count(*) AS c FROM big GROUP BY 1),
scored AS (
  SELECT big.doc_id, ln((bc.c + 1.0) / (uni.c + v.v)) AS lp
  FROM big JOIN bc USING (gram)
           JOIN uni ON big.prev = uni.word CROSS JOIN v),
s2 AS (SELECT doc_id, round(avg(lp), 6) AS lm_score
       FROM scored GROUP BY doc_id),
t AS (SELECT s2.doc_id, d.source, s2.lm_score,
             CAST(NTILE(3) OVER (PARTITION BY d.source
                 ORDER BY s2.lm_score DESC, s2.doc_id DESC) AS BIGINT)
               AS tile
      FROM s2 JOIN documents d USING (doc_id))
SELECT doc_id, source, lm_score, tile,
       CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM t ORDER BY doc_id"""

    from ..stages.aggregate import prf_at_threshold_sql, roc_auc_sql
    q["auc_quality"] = roc_auc_sql(
        "n_chars", "CASE WHEN source = 'src0' THEN 1 ELSE 0 END")
    from ..pipelines.queries import EVENT_CHARS
    from ..stages.aggregate import event_pattern_counts_sql
    q["event_patterns"] = event_pattern_counts_sql(
        "vc*p", EVENT_CHARS) + " ORDER BY user_id"

    q["prf_quality"] = prf_at_threshold_sql(
        "n_chars", "CASE WHEN source = 'src0' THEN 1 ELSE 0 END",
        threshold=500.0)

    from ..stages.sampling import length_batches_sql
    q["length_batches"] = length_batches_sql() + " ORDER BY doc_id"

    from ..stages.textstats import char_entropy_sql
    q["char_entropy"] = char_entropy_sql()

    from ..stages.textstats import gopher_quality_sql
    q["gopher_quality"] = gopher_quality_sql(min_words=30, max_words=90,
                                             min_stop_hits=1)

    # mmexternal: the external filter replies {"$!":{"mlen":len(line)}}
    # per raw message — the SQL twin is the character length of text
    # (1:1 with the engine's LF→space framing guard)
    q["mmexternal"] = f"""
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       CAST(LENGTH(text) AS BIGINT) AS mlen
FROM read_parquet('{src}')"""

    # omprog confirm protocol: the external consumer rejects lines
    # containing 'error' and OKs the rest
    q["omprog"] = f"""
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       NOT contains(text, 'error') AS confirmed
FROM read_parquet('{src}')"""

    return q
