"""PG ``to_char`` datetime templates, reference-faithful.

Mirror of the reference's template engine
(``expression/scalar/formatting/PGDateTimeTemplates.java`` — token
inventory, case-sensitive spellings, padding rules, the ``th``/``TH``
ordinal suffix contract, and the ``"..."`` quoted-literal escape
rules) and of ``ToCharFunction.java`` (timestamp operands format the
UTC LocalDateTime; interval operands format ``0000-01-01T00:00`` plus
the period).

Two emitters over one token stream:

- :func:`compile_to_sql` — a Spark SQL ``concat(...)`` expression for
  timestamp operands (pure built-ins, codegen-eligible, no UDF);
- :func:`format_interval` — a rewrite-time Python constant fold for
  interval-literal operands (the operand and the pattern are both
  literals, so nothing needs to run on the cluster at all). Year 0 is
  outside both Spark's and Python's calendar range; the fold leans on
  the 400-year Gregorian cycle — year 400 has the shape of proleptic
  year 0 — and shifts the displayed year/ISO-year/Julian day back.
"""

from __future__ import annotations

import datetime as _dt

# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

#: every template pattern spelling, exactly as the reference's enum
#: declares them (PGDateTimeTemplates.TemplatePattern) -> canonical
#: handler key. Matching is case-exact and longest-first; anything
#: unmatched is a single literal character.
_TOKENS: dict[str, str] = {}
for _spellings, _key in [
    (("HH24", "hh24"), "H24"),
    (("HH12", "hh12", "HH", "hh"), "H12"),
    (("MI", "mi"), "MI"),
    (("SSSSS", "sssss", "SSSS", "ssss"), "SPM"),
    (("SS", "ss"), "SEC"),
    (("MS", "ms"), "MS"),
    (("US", "us"), "US"),
    (("FF1", "ff1"), "FF1"),
    (("FF2", "ff2"), "FF2"),
    (("FF3", "ff3"), "FF3"),
    (("FF4", "ff4"), "FF4"),
    (("FF5", "ff5"), "FF5"),
    (("FF6", "ff6"), "FF6"),
    (("AM", "PM"), "AMU"),
    (("am", "pm"), "AML"),
    (("A.M.", "P.M."), "AMDU"),
    (("a.m.", "p.m."), "AMDL"),
    (("Y,YYY", "y,yyy"), "YCOMMA"),
    (("YYYY", "yyyy"), "Y4"),
    (("YYY", "yyy"), "Y3"),
    (("YY", "yy"), "Y2"),
    (("Y", "y"), "Y1"),
    (("IYYY", "iyyy"), "IY4"),
    (("IYY", "iyy"), "IY3"),
    (("IY", "iy"), "IY2"),
    (("I", "i"), "IY1"),
    (("BC", "AD"), "ERAU"),
    (("bc", "ad"), "ERAL"),
    (("B.C", "A.D"), "ERADU"),
    (("b.c", "a.d"), "ERADL"),
    (("MONTH",), "MONTHU"),
    (("Month",), "MONTHC"),
    (("month",), "MONTHL"),
    (("MON",), "MONU"),
    (("Mon",), "MONC"),
    (("mon",), "MONL"),
    (("MM", "mm"), "MM"),
    (("DAY",), "DAYU"),
    (("Day",), "DAYC"),
    (("day",), "DAYL"),
    (("DY",), "DYU"),
    (("Dy",), "DYC"),
    (("dy",), "DYL"),
    (("IDDD", "iddd"), "IDDD"),
    (("DDD", "ddd"), "DDD"),
    (("DD", "dd"), "DD"),
    (("ID", "id"), "ID"),
    (("D", "d"), "D"),
    (("WW", "ww"), "WW"),
    (("IW", "iw"), "IW"),
    (("W", "w"), "W"),
    (("CC", "cc"), "CC"),
    (("J", "j"), "J"),
    (("Q", "q"), "Q"),
    (("RM",), "RMU"),
    (("rm",), "RML"),
    (("TZH", "tzh", "TZM", "tzm", "TZ", "tz", "OF", "of"), "TZNONE"),
    (("TH",), "THU"),
    (("th",), "THL"),
]:
    for _s in _spellings:
        _TOKENS[_s] = _key

_BY_LENGTH = sorted(_TOKENS, key=len, reverse=True)

#: handlers whose output is a number usable by a following th/TH
_NUMERIC = {
    "H24", "H12", "MI", "SPM", "SEC", "MS", "US",
    "FF1", "FF2", "FF3", "FF4", "FF5", "FF6",
    "Y4", "Y3", "Y2", "Y1", "IY4", "IY3", "IY2", "IY1",
    "MM", "IDDD", "DDD", "DD", "ID", "D", "WW", "IW", "W",
    "CC", "J", "Q",
}


def tokenize(pattern: str) -> list[tuple[str, str]]:
    """Template -> ``[("tok", key) | ("lit", text)]``. Double-quoted
    sections are literal (backslash escapes the next char; an
    unmatched quote consumes the rest), mirroring the reference's
    parse()."""
    out: list[tuple[str, str]] = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == '"':
            buf, j = [], i + 1
            while j < len(pattern):
                c = pattern[j]
                if c == "\\" and j + 1 < len(pattern):
                    buf.append(pattern[j + 1])
                    j += 2
                elif c == '"':
                    j += 1
                    break
                else:
                    buf.append(c)
                    j += 1
            out.append(("lit", "".join(buf)))
            i = j
            continue
        for tok in _BY_LENGTH:
            if pattern.startswith(tok, i):
                out.append(("tok", _TOKENS[tok]))
                i += len(tok)
                break
        else:
            out.append(("lit", ch))
            i += 1
    return out


_ROMAN = ["I", "II", "III", "IV", "V", "VI",
          "VII", "VIII", "IX", "X", "XI", "XII"]
_MONTHS = ["January", "February", "March", "April", "May", "June",
           "July", "August", "September", "October", "November",
           "December"]
_DAYS = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
         "Saturday", "Sunday"]


# ---------------------------------------------------------------------------
# SQL emitter (timestamp operands)
# ---------------------------------------------------------------------------

def _sql_pieces(key: str, t: str) -> tuple[str, str | None]:
    """(string-expr, numeric-value-expr-or-None) for one token over
    timestamp expression ``t``."""
    d = f"CAST({t} AS DATE)"
    iso_dow = f"(weekday({d}) + 1)"  # Mon=1..Sun=7
    # Thursday of the ISO week anchors the ISO week-based year
    iso_year = f"year(date_add({d}, 3 - weekday({d})))"
    year = f"year({t})"
    us = f"((unix_micros({t}) % 1000000 + 1000000) % 1000000)"
    if key == "H12":
        v = (f"(CASE WHEN hour({t}) >= 12 THEN hour({t}) - 12 "
             f"ELSE hour({t}) END)")
        return f"lpad(CAST({v} AS STRING), 2, '0')", v
    if key == "H24":
        return f"lpad(CAST(hour({t}) AS STRING), 2, '0')", f"hour({t})"
    if key == "MI":
        return f"lpad(CAST(minute({t}) AS STRING), 2, '0')", f"minute({t})"
    if key == "SEC":
        return f"lpad(CAST(second({t}) AS STRING), 2, '0')", f"second({t})"
    if key == "SPM":
        v = f"(hour({t}) * 3600 + minute({t}) * 60 + second({t}))"
        return f"CAST({v} AS STRING)", v
    if key == "MS":
        return f"date_format({t}, 'SSS')", f"CAST({us} DIV 1000 AS INT)"
    # crate timestamps are epoch MILLIS — sub-ms digits are always 0
    # (ToCharFunctionPostgresCompatabilityTest: US of .12345 renders
    # 123000, FF4-6 pad with zeros)
    if key == "US":
        v = f"(({us} DIV 1000) * 1000)"
        return f"lpad(CAST({v} AS STRING), 6, '0')", v
    if key.startswith("FF"):
        div = 10 ** (6 - int(key[2]))
        v = f"((({us} DIV 1000) * 1000) DIV {div})"
        return f"CAST({v} AS STRING)", v
    if key == "AMU":
        return f"(CASE WHEN hour({t}) >= 12 THEN 'PM' ELSE 'AM' END)", None
    if key == "AML":
        return f"(CASE WHEN hour({t}) >= 12 THEN 'pm' ELSE 'am' END)", None
    if key == "AMDU":
        return f"(CASE WHEN hour({t}) >= 12 THEN 'P.M.' ELSE 'A.M.' END)", None
    if key == "AMDL":
        return f"(CASE WHEN hour({t}) >= 12 THEN 'p.m.' ELSE 'a.m.' END)", None
    if key == "YCOMMA":
        s = f"CAST({year} AS STRING)"
        return (f"concat(substring({s}, 1, 1), ',', substring({s}, 2))",
                None)
    if key == "Y4":
        return f"lpad(CAST({year} AS STRING), 4, '0')", year
    if key in ("Y3", "Y2", "Y1"):
        n = int(key[1])
        return f"right(lpad(CAST({year} AS STRING), 4, '0'), {n})", year
    if key == "IY4":
        return f"CAST({iso_year} AS STRING)", iso_year
    if key in ("IY3", "IY2", "IY1"):
        n = int(key[2])
        return f"right(CAST({iso_year} AS STRING), {n})", iso_year
    if key == "ERAU":
        return f"(CASE WHEN {year} >= 1 THEN 'AD' ELSE 'BC' END)", None
    if key == "ERAL":
        return f"(CASE WHEN {year} >= 1 THEN 'ad' ELSE 'bc' END)", None
    if key == "ERADU":
        return f"(CASE WHEN {year} >= 1 THEN 'A.D' ELSE 'B.C' END)", None
    if key == "ERADL":
        return f"(CASE WHEN {year} >= 1 THEN 'a.d' ELSE 'b.c' END)", None
    if key in ("MONTHU", "MONTHC", "MONTHL"):
        x = f"date_format({t}, 'MMMM')"
        x = {"MONTHU": f"upper({x})", "MONTHC": x,
             "MONTHL": f"lower({x})"}[key]
        # padEnd to 7 WITHOUT truncating (rpad would cut 'September')
        return (f"concat({x}, repeat(' ', "
                f"greatest(7 - length({x}), 0)))"), None
    if key in ("MONU", "MONC", "MONL"):
        x = f"date_format({t}, 'MMM')"
        return {"MONU": f"upper({x})", "MONC": x,
                "MONL": f"lower({x})"}[key], None
    if key == "MM":
        return f"lpad(CAST(month({t}) AS STRING), 2, '0')", f"month({t})"
    if key in ("DAYU", "DAYC", "DAYL"):
        x = f"date_format({t}, 'EEEE')"
        x = {"DAYU": f"upper({x})", "DAYC": x, "DAYL": f"lower({x})"}[key]
        return (f"concat({x}, repeat(' ', "
                f"greatest(8 - length({x}), 0)))"), None
    if key in ("DYU", "DYC", "DYL"):
        x = f"date_format({t}, 'EEE')"
        return {"DYU": f"upper({x})", "DYC": x,
                "DYL": f"lower({x})"}[key], None
    if key == "DDD":
        return (f"lpad(CAST(dayofyear({t}) AS STRING), 3, '0')",
                f"dayofyear({t})")
    if key == "IDDD":
        v = f"((weekofyear({d}) - 1) * 7 + {iso_dow})"
        return f"lpad(CAST({v} AS STRING), 3, '0')", v
    if key == "DD":
        return f"lpad(CAST(day({t}) AS STRING), 2, '0')", f"day({t})"
    if key == "ID":
        return f"CAST({iso_dow} AS STRING)", iso_dow
    if key == "D":
        v = f"(({iso_dow} % 7) + 1)"
        return f"CAST({v} AS STRING)", v
    if key == "W":
        v = f"(day({t}) DIV 7 + 1)"
        return f"CAST({v} AS STRING)", v
    if key == "WW":
        # WeekFields.of(ENGLISH).weekOfWeekBasedYear(): Sunday weeks,
        # week 1 = the week containing Jan 1
        ws = f"date_sub({d}, dayofweek({d}) - 1)"
        wby = f"year(date_add({ws}, 6))"
        jan1 = f"make_date({wby}, 1, 1)"
        ws1 = f"date_sub({jan1}, dayofweek({jan1}) - 1)"
        v = f"(datediff({ws}, {ws1}) DIV 7 + 1)"
        return f"lpad(CAST({v} AS STRING), 2, '0')", v
    if key == "IW":
        return (f"lpad(CAST(weekofyear({d}) AS STRING), 2, '0')",
                f"weekofyear({d})")
    if key == "CC":
        v = f"(({year} - 1) DIV 100 + 1)"
        return f"CAST({v} AS STRING)", v
    if key == "J":
        v = f"(datediff({d}, DATE '1970-01-01') + 2440588)"
        return f"CAST({v} AS STRING)", v
    if key == "Q":
        return f"CAST(quarter({t}) AS STRING)", f"quarter({t})"
    if key in ("RMU", "RML"):
        arr = ", ".join(f"'{r}'" for r in _ROMAN)
        x = f"element_at(array({arr}), month({t}))"
        if key == "RML":
            x = f"lower({x})"
        return (f"concat({x}, repeat(' ', "
                f"greatest(4 - length({x}), 0)))"), None
    if key == "TZNONE":
        return "''", None
    raise AssertionError(f"unhandled token {key}")


def _sql_ordinal(val: str, upper: bool) -> str:
    a = f"abs({val})"
    suf = (f"(CASE WHEN {a} % 100 BETWEEN 11 AND 13 THEN 'th' "
           f"WHEN {a} % 10 = 1 THEN 'st' "
           f"WHEN {a} % 10 = 2 THEN 'nd' "
           f"WHEN {a} % 10 = 3 THEN 'rd' ELSE 'th' END)")
    return f"upper({suf})" if upper else suf


def compile_to_sql(ts_expr: str, pattern: str) -> str:
    """to_char(<timestamp>, '<pattern>') as one Spark SQL expression —
    built-in functions only, wrapped in a NULL guard (STRICTNULL)."""
    pieces: list[str] = []
    prev_val: str | None = None
    prev_state = "lit"  # lit | num | nonnum
    for kind, val in tokenize(pattern):
        if kind == "lit":
            pieces.append("'" + val.replace("'", "''") + "'")
            prev_state, prev_val = "lit", None
            continue
        if val in ("THU", "THL"):
            if prev_state == "num" and prev_val is not None:
                pieces.append(_sql_ordinal(prev_val, val == "THU"))
            elif prev_state == "lit":
                pieces.append("'TH'" if val == "THU" else "'th'")
            # after a non-numeric pattern: empty suffix
            prev_state, prev_val = "lit", None
            continue
        s, v = _sql_pieces(val, ts_expr)
        pieces.append(s)
        if val in _NUMERIC:
            prev_state, prev_val = "num", v
        else:
            prev_state, prev_val = "nonnum", None
    if not pieces:
        body = "''"
    elif len(pieces) == 1:
        body = f"CAST({pieces[0]} AS STRING)"
    else:
        body = f"concat({', '.join(pieces)})"
    return (f"(CASE WHEN {ts_expr} IS NULL THEN CAST(NULL AS STRING) "
            f"ELSE {body} END)")


# ---------------------------------------------------------------------------
# Python emitter (interval-literal operands — rewrite-time fold)
# ---------------------------------------------------------------------------

def _interval_datetime(parts) -> _dt.datetime | None:
    """``LocalDateTime.of(0, 1, 1, 0, 0)`` plus the period
    (ToCharFunction.evaluateInterval), computed 400 years up the
    Gregorian cycle so Python's year-1 floor never trips."""
    y, mo, d, h, mi, s = parts
    total_mo = (400 + y) * 12 + mo
    yy, mm = divmod(total_mo, 12)
    try:
        return _dt.datetime(yy, mm + 1, 1) + _dt.timedelta(
            days=d, hours=h, minutes=mi, seconds=s
        )
    except (ValueError, OverflowError):
        return None


def _py_pieces(key: str, dt: _dt.datetime) -> tuple[str, int | None]:
    year = dt.year - 400
    iso_y, iso_w, iso_d = dt.isocalendar()
    iso_y -= 400
    us = dt.microsecond
    if key == "H12":
        v = dt.hour - 12 if dt.hour >= 12 else dt.hour
        return f"{v:02d}", v
    if key == "H24":
        return f"{dt.hour:02d}", dt.hour
    if key == "MI":
        return f"{dt.minute:02d}", dt.minute
    if key == "SEC":
        return f"{dt.second:02d}", dt.second
    if key == "SPM":
        v = dt.hour * 3600 + dt.minute * 60 + dt.second
        return str(v), v
    if key == "MS":
        return f"{us // 1000:03d}", us // 1000
    if key == "US":
        v = us // 1000 * 1000  # ms storage precision
        return f"{v:06d}", v
    if key.startswith("FF"):
        v = (us // 1000 * 1000) // (10 ** (6 - int(key[2])))
        return str(v), v
    if key in ("AMU", "AML", "AMDU", "AMDL"):
        pm = dt.hour >= 12
        return {
            "AMU": "PM" if pm else "AM",
            "AML": "pm" if pm else "am",
            "AMDU": "P.M." if pm else "A.M.",
            "AMDL": "p.m." if pm else "a.m.",
        }[key], None
    if key == "YCOMMA":
        s = str(year)
        return s[:1] + "," + s[1:], None
    if key == "Y4":
        return f"{year:04d}", year
    if key in ("Y3", "Y2", "Y1"):
        return f"{year:04d}"[-int(key[1]):], year
    if key == "IY4":
        return str(iso_y), iso_y
    if key in ("IY3", "IY2", "IY1"):
        return str(iso_y)[-int(key[2]):], iso_y
    if key in ("ERAU", "ERAL", "ERADU", "ERADL"):
        ad = year >= 1
        return {
            "ERAU": "AD" if ad else "BC",
            "ERAL": "ad" if ad else "bc",
            "ERADU": "A.D" if ad else "B.C",
            "ERADL": "a.d" if ad else "b.c",
        }[key], None
    if key in ("MONTHU", "MONTHC", "MONTHL"):
        n = _MONTHS[dt.month - 1]
        n = {"MONTHU": n.upper(), "MONTHC": n, "MONTHL": n.lower()}[key]
        return n.ljust(7), None
    if key in ("MONU", "MONC", "MONL"):
        n = _MONTHS[dt.month - 1][:3]
        return {"MONU": n.upper(), "MONC": n, "MONL": n.lower()}[key], None
    if key == "MM":
        return f"{dt.month:02d}", dt.month
    if key in ("DAYU", "DAYC", "DAYL"):
        n = _DAYS[dt.weekday()]
        n = {"DAYU": n.upper(), "DAYC": n, "DAYL": n.lower()}[key]
        return n.ljust(8), None
    if key in ("DYU", "DYC", "DYL"):
        n = _DAYS[dt.weekday()][:3]
        return {"DYU": n.upper(), "DYC": n, "DYL": n.lower()}[key], None
    if key == "DDD":
        v = dt.timetuple().tm_yday
        return f"{v:03d}", v
    if key == "IDDD":
        v = (iso_w - 1) * 7 + iso_d
        return f"{v:03d}", v
    if key == "DD":
        return f"{dt.day:02d}", dt.day
    if key == "ID":
        return str(iso_d), iso_d
    if key == "D":
        v = (iso_d % 7) + 1
        return str(v), v
    if key == "W":
        v = dt.day // 7 + 1
        return str(v), v
    if key == "WW":
        dd = dt.date()
        ws = dd - _dt.timedelta(days=(dd.weekday() + 1) % 7)
        wby = (ws + _dt.timedelta(days=6)).year
        jan1 = _dt.date(wby, 1, 1)
        ws1 = jan1 - _dt.timedelta(days=(jan1.weekday() + 1) % 7)
        v = (ws - ws1).days // 7 + 1
        return f"{v:02d}", v
    if key == "IW":
        return f"{iso_w:02d}", iso_w
    if key == "CC":
        # Java truncating division on (year-1)/100
        v = int((year - 1) / 100) + 1
        return str(v), v
    if key == "J":
        v = (dt.date() - _dt.date(1970, 1, 1)).days + 2440588 - 146097
        return str(v), v
    if key == "Q":
        v = (dt.month + 2) // 3
        return str(v), v
    if key in ("RMU", "RML"):
        r = _ROMAN[dt.month - 1]
        if key == "RML":
            r = r.lower()
        return r.ljust(4), None
    if key == "TZNONE":
        return "", None
    raise AssertionError(f"unhandled token {key}")


def _py_ordinal(v: int, upper: bool) -> str:
    n = abs(v)
    if n % 100 in (11, 12, 13):
        suf = "th"
    else:
        suf = {1: "st", 2: "nd", 3: "rd"}.get(n % 10, "th")
    return suf.upper() if upper else suf


def format_interval(parts, pattern: str) -> str | None:
    """Constant-fold ``to_char(INTERVAL '<lit>', '<pattern>')``.
    ``parts`` are NORMALIZED (y, mo, d, h, mi, s) fields. None when
    the synthetic datetime leaves the calendar range."""
    dt = _interval_datetime(parts)
    if dt is None:
        return None
    out: list[str] = []
    prev_val: int | None = None
    prev_state = "lit"
    for kind, val in tokenize(pattern):
        if kind == "lit":
            out.append(val)
            prev_state, prev_val = "lit", None
            continue
        if val in ("THU", "THL"):
            if prev_state == "num" and prev_val is not None:
                out.append(_py_ordinal(prev_val, val == "THU"))
            elif prev_state == "lit":
                out.append("TH" if val == "THU" else "th")
            prev_state, prev_val = "lit", None
            continue
        s, v = _py_pieces(val, dt)
        out.append(s)
        if val in _NUMERIC:
            prev_state, prev_val = "num", v
        else:
            prev_state, prev_val = "nonnum", None
    return "".join(out)
