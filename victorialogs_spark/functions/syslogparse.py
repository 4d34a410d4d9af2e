"""Reference-exact syslog parsing (syslog_parser.go).

The parser is PROGRESSIVE: each header field is optional from the right
— "Jun  3 12:08:33 abcd" yields timestamp+hostname and nothing else,
and a truncated RFC5424 header keeps whatever fields it reached
(syslog_parser_test.go pins every partial shape). A single regex cannot
express that, hence the scanner (the extract pipe precedent).

Field rules (Parse → parseNoHeader → parseRFC3164/parseRFC5424):
- leading ``<N>``: priority (raw), then facility/severity keyword+number
  fields when N parses as an unsigned int — otherwise STOP after
  priority;
- ``1 `` after the priority selects RFC5424, anything else RFC3164;
- RFC3164 timestamps ("MMM _d HH:MM:SS", no year) convert to
  ISO8601-millis UTC with the CURRENT year read as wall clock in the
  ``offset`` timezone, rolling back one year when the result lands >24h
  in the future (syslog_parser.go:423-440); unparseable leading text
  makes the whole remainder the message;
- RFC5424 keeps the wire timestamp verbatim and flattens structured
  data params into ``sdID.param`` fields (bare ``param`` when the sd id
  itself is a ``key=value`` pair, which is emitted as its own field);
  an sd element without params emits ``sdID`` with an empty value; a
  malformed SD section stops the parse (no message field).

Used by the unpack_syslog pipe through an Arrow-batched map UDF
(dynamic SD field names need the same key-inference machinery as
unpack_json) and by the batch/listener source path.
"""

from __future__ import annotations

import datetime as _dt

from victorialogs_spark.logsql.lexer import _unquote

SYSLOG_LEVELS = [
    "emerg", "alert", "critical", "error", "warning", "notice", "info",
    "debug",
]
SYSLOG_FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]

_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        "Jan Feb Mar Apr May Jun Jul Aug Sep Oct Nov Dec".split()
    )
}

_UTC = _dt.timezone.utc


def _try_unquote(s: str) -> tuple[str | None, int]:
    """tryUnquoteString: (value, chars consumed) or (None, -1)."""
    if not s or s[0] not in ('"', "`"):
        return None, -1
    try:
        v, end = _unquote(s, 0, s[0])
        return v, end
    except ValueError:
        return None, -1


def _parse_logfmt_pairs(s: str) -> list[tuple[str, str]]:
    """logfmt_parser.go parse() + addField: names TrimSpace, a pair that
    is empty on both sides drops (runs of spaces), a bare key yields an
    empty value, and a bare '=value' keeps the empty name (the engine's
    ''≡_msg rule applies at field-write time)."""
    out: list[tuple[str, str]] = []

    def add(name: str, value: str) -> None:
        name = name.strip()
        if name or value:
            out.append((name, value))

    while True:
        n = _index_any(s, "= ")
        if n < 0:
            add(s, "")
            return out
        name, ch, s = s[:n], s[n], s[n + 1 :]
        if ch == " ":
            add(name, "")
            continue
        if not s:
            add(name, "")
            return out
        value, consumed = _try_unquote(s)
        if consumed >= 0:
            add(name, value)
            s = s[consumed:]
            if not s or s[0] != " ":
                return out
            s = s[1:]
        else:
            n = s.find(" ")
            if n < 0:
                add(name, s)
                return out
            add(name, s[:n])
            s = s[n + 1 :]


def _index_any(s: str, chars: str) -> int:
    best = -1
    for ch in chars:
        i = s.find(ch)
        if i >= 0 and (best < 0 or i < best):
            best = i
    return best


def _rfc3164_timestamp(
    stamp: str, year: int, now_unix: float, offset_ns: int
) -> str | None:
    """time.Stamp parse + year inference → ISO8601-millis UTC string."""
    if len(stamp) != 15:
        return None
    mon = _MONTHS.get(stamp[:3])
    if mon is None or stamp[3] != " ":
        return None
    day_s, rest = stamp[4:6], stamp[7:]
    if stamp[6] != " " or not day_s.strip().isdigit():
        return None
    try:
        h, m, sec = int(rest[0:2]), int(rest[3:5]), int(rest[6:8])
        if rest[2] != ":" or rest[5] != ":":
            return None
    except (ValueError, IndexError):
        return None
    day = int(day_s)

    def build(y: int) -> _dt.datetime:
        # Go time.Date normalizes out-of-range days (Feb 29 → Mar 1)
        base = _dt.datetime(y, mon, 1, tzinfo=_UTC)
        t = base + _dt.timedelta(days=day - 1, hours=h, minutes=m, seconds=sec)
        return t - _dt.timedelta(microseconds=offset_ns // 1000)

    t = build(year)
    if t.timestamp() - 24 * 3600 > now_unix:
        t = build(year - 1)
    return t.strftime("%Y-%m-%dT%H:%M:%S") + ".000Z"


def syslog_fields(
    s: str, year: int, now_unix: float, offset_ns: int = 0
) -> dict[str, str]:
    """Parse one syslog line into its field dict (last duplicate wins)."""
    fields: list[tuple[str, str]] = []
    _parse(s, year, now_unix, offset_ns, fields)
    return dict(fields)


def _parse(s, year, now_unix, offset_ns, fields) -> None:
    if not s:
        return
    if s[0] != "<":
        _parse_no_header(s, year, now_unix, offset_ns, fields)
        return
    s = s[1:]
    n = s.find(">")
    if n < 0:
        return
    priority_str, s = s[:n], s[n + 1 :]
    fields.append(("priority", priority_str))
    if not priority_str or not priority_str.isascii() or not priority_str.isdigit():
        return
    priority = int(priority_str)
    facility, severity = priority // 8, priority % 8
    fields.append((
        "facility_keyword",
        SYSLOG_FACILITIES[facility] if facility < len(SYSLOG_FACILITIES) else "unknown",
    ))
    fields.append((
        "level",
        SYSLOG_LEVELS[severity] if severity < len(SYSLOG_LEVELS) else "unknown",
    ))
    fields.append(("facility", str(facility)))
    fields.append(("severity", str(severity)))
    _parse_no_header(s, year, now_unix, offset_ns, fields)


def _parse_no_header(s, year, now_unix, offset_ns, fields) -> None:
    if not s:
        return
    if s.startswith("1 "):
        _parse_rfc5424(s[2:], fields)
    else:
        _parse_rfc3164(s, year, now_unix, offset_ns, fields)


def _parse_rfc3164(s, year, now_unix, offset_ns, fields) -> None:
    fields.append(("format", "rfc3164"))
    if len(s) < 15:
        fields.append(("message", s))
        return
    iso = _rfc3164_timestamp(s[:15], year, now_unix, offset_ns)
    if iso is None:
        fields.append(("message", s))
        return
    s = s[15:]
    fields.append(("timestamp", iso))
    if not s or s[0] != " ":
        if s:
            fields.append(("message", s))
        return
    s = s[1:]
    n = s.find(" ")
    if n < 0:
        fields.append(("hostname", s))
        return
    fields.append(("hostname", s[:n]))
    s = s[n + 1 :]
    n = _index_any(s, "[: ")
    if n < 0:
        fields.append(("app_name", s))
        return
    fields.append(("app_name", s[:n]))
    s = s[n:]
    if not s:
        return
    if s[0] == "[":
        s = s[1:]
        n = s.find("]")
        if n < 0:
            return
        fields.append(("proc_id", s[:n]))
        s = s[n + 1 :]
    s = s[1:] if s.startswith(":") else s
    s = s[1:] if s.startswith(" ") else s
    if s:
        fields.append(("message", s))


def _parse_rfc5424(s, fields) -> None:
    fields.append(("format", "rfc5424"))
    if not s:
        return
    for name in ("timestamp", "hostname", "app_name", "proc_id", "msg_id"):
        n = s.find(" ")
        if n < 0:
            fields.append((name, s))
            return
        fields.append((name, s[:n]))
        s = s[n + 1 :]
    tail = _parse_rfc5424_sd(s, fields)
    if tail is None:
        return
    fields.append(("message", tail))


def _parse_rfc5424_sd(s, fields) -> str | None:
    if s.startswith("- "):
        return s[2:]
    while True:
        tail = _parse_rfc5424_sd_line(s, fields)
        if tail is None:
            return None
        s = tail
        if s.startswith(" "):
            return s[1:]


def _parse_rfc5424_sd_line(s, fields) -> str | None:
    if not s or s[0] != "[":
        return None
    s = s[1:]
    n = _index_any(s, " ]")
    if n < 0:
        return None
    sd_id, s = s[:n], s[n:]
    if "=" in sd_id:
        # special case: the sd id itself is a key=value pair
        k, v = sd_id.split("=", 1)
        fields.append((k, v))
        sd_id = ""
    i = 0
    while i < len(s) and (s[i] != "]" or (i > 0 and s[i - 1] == "\\")):
        if s[i] == " ":
            i += 1
            continue
        n = s.find("=", i)
        if n < 0:
            return None
        i = n + 1
        if i < len(s) and s[i] == '"':
            valid = False
            i += 1
            while i < len(s):
                if s[i] == '"' and s[i - 1] != "\\":
                    valid = True
                    break
                i += 1
            if not valid:
                return None
            i += 1
        else:
            n = _index_any(s[i:], " ]")
            if n < 0:
                return None
            i += n
    if i == len(s):
        return None
    sd_value = s[:i].replace("\\]", "]").strip()
    if sd_value:
        pairs = _parse_logfmt_pairs(sd_value)
    else:
        pairs = []
    if not pairs:
        if sd_id:
            fields.append((sd_id, ""))
    else:
        for k, v in pairs:
            fields.append((f"{sd_id}.{k}" if sd_id else k, v))
    return s[i + 1 :]


def logfmt_fields(s: str) -> dict[str, str]:
    """One logfmt line → field dict: the pipe surface of
    _parse_logfmt_pairs, with the data model's ''≡_msg name rule and
    last-duplicate-wins."""
    out: dict[str, str] = {}
    for k, v in _parse_logfmt_pairs(s) if s else []:
        out[k or "_msg"] = v
    return out


def logfmt_map_column(src):
    """Arrow-batched map<string,string> column of logfmt fields."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType

    def _parse_col(col: "pd.Series") -> "pd.Series":
        return col.map(
            lambda v: logfmt_fields(v) if isinstance(v, str) else None
        )

    udf = F.pandas_udf(_parse_col, "map<string,string>", PandasUDFType.SCALAR)
    return udf(src)


def syslog_map_column(src, year: int, now_unix: float, offset_ns: int = 0):
    """Arrow-batched map<string,string> column of parsed syslog fields.
    year/now are PLAN-TIME constants (the reference reads them per
    parse; identical for batch queries)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType

    def _parse_col(col: "pd.Series") -> "pd.Series":
        return col.map(
            lambda v: syslog_fields(v, year, now_unix, offset_ns)
            if isinstance(v, str)
            else None
        )

    udf = F.pandas_udf(_parse_col, "map<string,string>", PandasUDFType.SCALAR)
    return udf(src)
