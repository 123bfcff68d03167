"""Row-at-a-time oracle with the exact semantics of the reference engine.

This module is the *parity oracle*: an independent, from-scratch,
plain-Python reimplementation of ``workflows_for_input`` and every
``@workflow`` extractor of ``oda-hub/literature-to-facts``.  The vectorized
Spark extractors (literature_to_facts_spark.extractors) are tested against it
triple-by-triple (P/R == 1.0 expected on the fixture corpus).

It deliberately preserves the reference's observable bugs; each function
cites the reference location it models.  Network side-lookups (balrog JSON,
AMON notices, ADS) are replaced by :class:`SideTables` lookups — the Spark
engine turns these into broadcast joins.

Structure is table-driven (one ordered extractor list per document kind)
rather than the reference's decorator registry; regex strings and control
flow decisions are the spec being reproduced, not copied code.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime
from typing import Callable, Optional

from literature_to_facts_spark.functions.literals import PAPER_NS, from_n3, literal_n3
from literature_to_facts_spark.functions.textnorm import (
    collapse_nl_24,
    collapse_space_nl,
    collapse_ws,
)


class IdentityError(Exception):
    """Document identity could not be established (doc is dropped)."""


@dataclass
class SideTables:
    """Pre-fetched payloads replacing the reference's in-extractor HTTP calls.

    * ``balrog``: url_json -> dict(grb_isot, gbm_trigger_id, balrog_ra,
      balrog_ra_err, balrog_dec, balrog_dec_err)   [facts/gcn.py:165-172]
    * ``amon_notices``: notice url -> raw notice block text [facts/gcn.py:343]
    * ``ads_authors``: SUBJECT -> gcn_authors string          [adsabs.py:22-36]
    """

    balrog: dict = field(default_factory=dict)
    amon_notices: dict = field(default_factory=dict)
    ads_authors: dict = field(default_factory=dict)


# ---------------------------------------------------------------------------
# common.py semantics
# ---------------------------------------------------------------------------

# facts/common.py:11-19 — NOTE "blazar" "GW170817" adjacent string literals
# (missing comma) concatenate into the single keyword "blazarGW170817";
# there is no standalone "blazar" or "GW170817" keyword.  Bug preserved.
RELEVANT_KEYWORDS = [
    "HAWC", "INTEGRAL", "CTA", "HESS", "MAGIC", "LST", "SKA",
    "IceCube", "LIGO/Virgo", "ANTARES", "Fermi/LAT",
    "SPI-ACS", "ISGRI",
    "FRB", "GRB", "magnetar", "SGR",
    "blazar" "GW170817", "GW190425",
]

# facts/common.py:37-57
GRBLIKE_PATTERNS = [
    (r"\b(IceCube|IC|GRB|FRB|PKS|Mrk|HAWC)([ -]?)([0-9\.\-\+]{2,}[A-Z]?)\b", "{}{}{}"),
    (r"\b(AT) *?([0-9]{4}[a-z]{3})\b", "{}{}"),
    (r"\b(ZTF)([0-9]{2}[a-z]{7})\b", "{}{}"),
]

# facts/common.py:25-28
CITE_PREFIXES = {
    "atel": ["atel"],
    "gcn": ["gcn circ.", "gcn circ", "gcnc", "gcn"],
}


def paperid_to_uri(kind: str, pid) -> str:
    """facts/common.py:7-8 (int() coercion included)."""
    return f"{PAPER_NS}#{kind}{int(pid):d}"


def mentions_keyword_common(title: str, body: str) -> dict:
    """facts/common.py:60-80.

    Bugs preserved: (a) keyword used as a *regex*, case-sensitive;
    (b) the title branch stores the BODY count ``n`` into ``_times``
    (facts/common.py:77), not the title count.
    """
    d = {}
    for keyword in RELEVANT_KEYWORDS:
        k = keyword.lower()
        n = len(re.findall(keyword, body))
        if n > 0:
            d["mentions_" + k] = "body"
        if n > 1:
            d["mentions_" + k + "_times"] = n
        nt = len(re.findall(keyword, title))
        if nt > 0:
            d["mentions_" + k] = "title"
        if nt > 1:
            d["mentions_" + k + "_times"] = n  # reference bug: n, not nt
    return d


def mentions_grblike_common(title: str, body: str) -> dict:
    """facts/common.py:37-57 (title scanned before body; duplicates kept)."""
    d: dict = {}
    for text in (title, body):
        for pattern, fmt in GRBLIKE_PATTERNS:
            for r in re.findall(pattern, text):
                if isinstance(r, str):
                    r = [r]
                full_name = fmt.format(*r).replace(" ", "")
                kind = r[0]
                d.setdefault("mentions_named_event", []).append(full_name)
                d.setdefault("mentions_named_event_type", []).append(kind)
                d.setdefault(f"mentions_named_{kind.lower()}", []).append(full_name)
    return d


def cites_common(title: str, body: str) -> dict:
    """facts/common.py:22-35.

    Bugs preserved: ``cites_<kind>_id`` is assigned (last match wins, scalar
    string, facts/common.py:32); the '.' in prefix 'gcn circ.' is a regex
    any-char; overlapping prefixes append duplicate URIs to ``cites``.
    """
    d: dict = {}
    for kind, prefixes in CITE_PREFIXES.items():
        for text in (title, body):
            for prefix in prefixes:
                for pid in re.findall(f"{prefix} *?" + r"#?(\d{3,})", text, re.I):
                    d[f"cites_{kind}_id"] = pid
                    d.setdefault("cites", []).append(paperid_to_uri(kind, pid))
    return d


# ---------------------------------------------------------------------------
# GCN extractors (facts/gcn.py)
# ---------------------------------------------------------------------------

def gcn_identity(text: str) -> str:
    """facts/gcn.py:58-69."""
    r = re.search("NUMBER:(.*)", text)
    if r is None:
        raise IdentityError("no NUMBER header in GCN text")
    return paperid_to_uri("gcn", int(r.groups()[0]))


def x_gcn_instrument(text: str, side: SideTables) -> dict:
    """facts/gcn.py:88-101 (may return instrument=[] — still non-empty dict)."""
    instruments = []
    for i, m in [
        ("fermi-gbm", "Fermi/GBM"),
        ("fermi-gbm", "Fermi GBM"),
        ("fermi-lat", "Fermi/LAT"),
        ("agile", "AGILE"),
    ]:
        if re.search(f"SUBJECT:.*{m}.*", text):
            instruments.append(i)
    return dict(instrument=instruments)


def x_gcn_mentions_keyword(text: str, side: SideTables) -> dict:
    """facts/gcn.py:104-106 (title='', body=full text)."""
    return mentions_keyword_common("", text)


def x_gcn_mentions_named(text: str, side: SideTables) -> dict:
    """facts/gcn.py:109-111."""
    return mentions_grblike_common("", text)


def x_fermi_realtime(text: str, side: SideTables) -> dict:
    """facts/gcn.py:114-138 (strptime failure drops the whole dict)."""
    d: dict = {}
    r = re.search(r"At (.*?), the Fermi Gamma-ray Burst Monitor \(GBM\) triggered", text)
    if r is not None:
        d["grb_isot"] = datetime.strptime(
            r.groups()[0].strip(), "%H:%M:%S UT on %d %b %Y"
        ).strftime("%Y-%m-%dT%H:%M:%S")
    r = re.search(
        r"The on-ground calculated location, using the Fermi GBM trigger data.*?"
        r"RA = (?P<ra>[\d\.\-\+]*?), Dec = (?P<dec>[\d\.\-\+]*?) .*?"
        r"with a statistical uncertainty of (?P<rad>[\d\.\-\+]*?) degrees.",
        text,
    )
    if r is not None:
        d["gbm_ra"] = r.group("ra")
        d["gbm_dec"] = r.group("dec")
        d["gbm_rad"] = r.group("rad")
    return d


def x_fermi_v2(text: str, side: SideTables) -> dict:
    """facts/gcn.py:140-153 (normalize collapses spaces+\\n only, no \\r)."""
    d: dict = {}
    r = re.search(
        r"At (?P<grb_date>[0-9:\.]*? UT on [0-9]{1,2} [a-zA-Z]*? [0-9]{4}?).*?, "
        r"the Fermi Gamma-Ray Burst Monitor \(GBM\) triggered and located "
        r"(?P<name>GRB [0-9]{6}[A-G])",
        collapse_space_nl(text),
    )
    if r is not None:
        d["grb_isot"] = datetime.strptime(
            r.group("grb_date").strip(), "%H:%M:%S.%f UT on %d %B %Y"
        ).strftime("%Y-%m-%dT%H:%M:%S.%f")
    return d


def x_gbm_balrog(text: str, side: SideTables) -> dict:
    """facts/gcn.py:155-174 — JSON fetch replaced by SideTables.balrog.

    If the URL is missing from the side table, the reference's fetch would
    raise -> the whole dict (incl. url/url_json) is dropped.
    """
    d: dict = {}
    r = re.search(r"(?P<url_json>https://.*?json)", text)
    if r:
        d["url_json"] = r.group("url_json")
        d["url"] = d["url_json"].replace("/json", "/")
        payload = side.balrog[d["url_json"]]  # KeyError == fetch failure
        d["grb_isot"] = payload["grb_isot"].replace("Z", "")
        d["gbm_trigger_id"] = int(payload["gbm_trigger_id"])
        d["balrog_ra"] = payload["balrog_ra"]
        d["balrog_ra_err"] = payload["balrog_ra_err"]
        d["balrog_dec"] = payload["balrog_dec"]
        d["balrog_dec_err"] = payload["balrog_dec_err"]
    return d


def x_swift_detected(text: str, side: SideTables) -> dict:
    """facts/gcn.py:177-194 (count=24 newline collapse; last char of the GRB
    name is stripped before date assembly)."""
    d: dict = {}
    T = collapse_nl_24(text)
    r = re.search(
        r"At (.*?) UT, the Swift Burst Alert Telescope \(BAT\) triggered "
        r"and located (GRB ?.*?) ",
        T,
    )
    if r is not None:
        d["grb_isot"] = datetime.strptime(
            r.groups()[0].strip() + " " + r.groups()[1].strip()[:-1].replace(" ", ""),
            "%H:%M:%S GRB%y%m%d",
        ).strftime("%Y-%m-%dT%H:%M:%S")
    return d


def x_swift_trigger_id(text: str, side: SideTables) -> dict:
    """facts/gcn.py:196-210."""
    d: dict = {}
    T = collapse_nl_24(text)
    if re.search(r"SUBJECT: .*?Swift detection", T) is not None:
        r_t = re.search("trigger=([0-9]+)", T)
        if r_t is not None:
            d["swift_trigger_id"] = int(r_t.group(1))
            d["detected_by"] = "swift"
    return d


def gcn_meta_fields(text: str) -> dict:
    """facts/gcn.py:214-227 (KeyError when NUMBER/SUBJECT missing -> drop)."""
    d: dict = {}
    for c in ("DATE", "SUBJECT", "NUMBER"):
        r = re.search(c + ":(.*)", text)
        if r is not None:
            d[c] = r.groups()[0].strip()
    d["location"] = f"https://gcn.gsfc.nasa.gov/gcn3/{d['NUMBER']}.gcn3"
    d["title"] = d["SUBJECT"]
    d["source"] = "GCN"
    return d


def x_gcn_meta(text: str, side: SideTables) -> dict:
    return gcn_meta_fields(text)


def x_gcn_date(text: str, side: SideTables) -> dict:
    """facts/gcn.py:230-235 — naive strptime().timestamp(); TZ pinned UTC."""
    t = datetime.strptime(
        gcn_meta_fields(text)["DATE"], "%y/%m/%d %H:%M:%S GMT"
    ).timestamp()
    return dict(timestamp=t)


def x_gcn_named(text: str, side: SideTables) -> dict:
    """facts/gcn.py:237-246."""
    r = re.search("SUBJECT: *(GRB.*?):.*", text, re.I)
    if r is not None:
        return dict(mentions_named_grb=r.groups()[0].strip().replace(" ", ""))
    return {}


def x_gcn_lvc_event(text: str, side: SideTables) -> dict:
    """facts/gcn.py:248-265."""
    D: dict = {}
    r = re.search("SUBJECT: *(LIGO/Virgo.*?):", text, re.I)
    if r is not None:
        D["lvc_event"] = r.groups()[0].strip()
        r = re.search(
            r"at (\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d*?) UTC",
            collapse_ws(text),
            re.I,
        )
        if r is not None:
            D["lvc_event_utc"] = r.groups()[0].strip()
    return D


def x_gcn_integral_lvc_countepart_search(text: str, side: SideTables) -> dict:
    """facts/gcn.py:267-284 (fields emitted independently)."""
    D: dict = {}
    r = re.search("SUBJECT: *(LIGO/Virgo.*?):.*INTEGRAL", text, re.I)
    if r is not None:
        D["original_event"] = r.groups()[0].strip()
    r_u = re.search(r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:[\d\.]+?) UTC, hereafter T0", text)
    if r_u is not None:
        D["original_event_utc"] = r_u.groups()[0].strip()
    return D


def x_gcn_integral_countepart_search(text: str, side: SideTables) -> dict:
    """facts/gcn.py:287-318 (3 fallback SUBJECT regexes; needs event AND T0)."""
    r = re.search("SUBJECT:(.*?):.*counterpart.*INTEGRAL", text, re.I)
    if r is None:
        r = re.search("SUBJECT:(.*?):.*INTEGRAL.*counterpart.*", text, re.I)
    if r is None:
        r = re.search("SUBJECT:(.*?):.*associated.*INTEGRAL.*", text, re.I)
    r_u = re.search(r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:[\d\.]+?) UTC, hereafter T0", text)
    if r is not None and r_u is not None:
        instruments = []
        if re.search("SUBJECT:(.*?):.*ACS.*", text, re.I):
            instruments.append("acs")
        if re.search("SUBJECT:(.*?):.*IBIS.*", text, re.I):
            instruments.append("ibis")
        return dict(
            original_event=r.groups()[0].strip(),
            original_event_utc=r_u.groups()[0].strip(),
            instrument=instruments,
        )
    return {}


AMON_NOTICE_SEP = "/" * 70


def parse_amon_notice_block(block_text: str) -> dict:
    """facts/gcn.py:345-373 — fixed-width key/value AMON notice parse.

    RuntimeError on malformed discovery_date/discovery_time is preserved
    (drops the whole icecube extractor for docs joined to this notice).
    """
    d: dict = {}
    for notice_text in block_text.split(AMON_NOTICE_SEP):
        for line in notice_text.split("\n"):
            k = line[:18].strip().strip(":").lower()
            raw_v = line[18:].strip()
            if k == "":
                continue
            v: object = raw_v
            r_deg = re.match(r"^([\d\.+\-]*?)d", raw_v)
            if r_deg:
                v = float(r_deg.group(1))
            if k == "discovery_date":
                r_date = re.search(r"(\d{2}/\d{2}/\d{2}) \(yy/mm/dd\)", raw_v)
                if r_date:
                    v = r_date.group(1)
                    k = "date_ymd"
                else:
                    raise RuntimeError("malformed discovery_date")
            if k == "discovery_time":
                r_time = re.search(r"\{(\d{2}:\d{2}:[\d\.]+)\} UT", raw_v)
                if r_time:
                    v = r_time.group(1)
                    k = "time_hms"
                else:
                    raise RuntimeError("malformed discovery_time")
            d[f"amon_gcn_notice_{k}"] = v
    return d


def x_gcn_icecube_circular(text: str, side: SideTables) -> dict:
    """facts/gcn.py:321-415 (AMON path via side table; inline fallback;
    event_ra/dec precedence: icecube_* then amon src_*)."""
    r = re.search("SUBJECT:(.*?) *?:?-? *?IceCube observation of a(.*)", text, re.I)
    d: dict = {}
    if r is None:
        return d
    ev, descr = r.groups()
    d = dict(
        reports_icecube_event=ev.strip(),
        reports_event=ev.strip(),
        icecube_event_descr=descr.strip(),
    )
    r_notice_url = re.search(r"(https://gcn.gsfc.nasa.gov/.*?\.amon)", text)
    if r_notice_url is not None:
        block = side.amon_notices[r_notice_url.group(1)]  # KeyError == fetch fail
        d.update(parse_amon_notice_block(block))
    else:
        r_t = re.search(
            r"On (?P<date_time>\d{4}[/\- ]\d{2}[/\- ]\d{2} at \d{2}:\d{2}:[\d\.]*?) UT IceCube",
            text,
        )
        if r_t:
            d["event_isot"] = datetime.strptime(
                r_t.group("date_time").strip().replace("-", "/"),
                "%Y/%m/%d at %H:%M:%S.%f",
            ).strftime("%Y-%m-%dT%H:%M:%S.%f")
        r_ra = re.search(r"RA: (?P<ra>[\d\.\-\+]*?) ", text)
        if r_ra is not None:
            d["icecube_ra"] = r_ra.group("ra")
            d["event_ra"] = r_ra.group("ra")
        r_dec = re.search(r"Dec: (?P<dec>[\d\.\-\+]*?) ", text)
        if r_dec is not None:
            d["icecube_dec"] = r_dec.group("dec")
    if "icecube_ra" in d and "icecube_dec" in d:
        d["event_ra"] = d["icecube_ra"]
        d["event_dec"] = d["icecube_dec"]
    if "amon_gcn_notice_src_ra" in d and "amon_gcn_notice_src_dec" in d:
        d["event_ra"] = d["amon_gcn_notice_src_ra"]
        d["event_dec"] = d["amon_gcn_notice_src_dec"]
    if "amon_gcn_notice_time_hms" in d and "amon_gcn_notice_date_ymd" in d:
        d["event_isot"] = datetime.strptime(
            d["amon_gcn_notice_date_ymd"] + " " + d["amon_gcn_notice_time_hms"],
            "%y/%m/%d %H:%M:%S.%f",
        ).strftime("%Y-%m-%dT%H:%M:%S.%f")
    return d


def x_gcn_lvc_circular(text: str, side: SideTables) -> dict:
    """facts/gcn.py:418-426."""
    r = re.search("SUBJECT:.*?(LIGO/Virgo .*?): Identification", text, re.I)
    if r is not None:
        return dict(lvc_event_report=r.groups()[0].strip())
    return {}


def x_integral_ul_old_variation(text: str, side: SideTables) -> dict:
    """facts/gcn.py:429-450 (4 regex fallbacks over collapsed text)."""
    T = collapse_ws(text)
    r = re.search(r"upper limit .*? ([\d\.e\-]*?) erg/cm.*? for a 1 s duration", T)
    if r is None:
        r = re.search(r"We find a limiting fluence of ([\d\.e\-]*?) erg/cm", T, re.I)
    if r is None:
        r = re.search(r"([\d\.e\-]*?) erg/cm2 for 1 s", T)
    if r is None:
        r = re.search(r"limiting peak flux is ~([\d\.e\-\^x]*?) erg/cm.*? at 1 s time scale", T)
    if r is not None:
        return dict(integral_ul=float(r.groups()[0].strip().replace("x10^", "e")))
    return {}


def x_integral_ul(text: str, side: SideTables) -> dict:
    """facts/gcn.py:453-462."""
    r = re.search(
        r"upper limit on the 75-2000 keV fluence of ([\d\.e\-\^x]*?) *?erg/cm",
        collapse_ws(text),
    )
    if r is not None:
        return dict(integral_ul=float(r.groups()[0].strip().replace("x10^", "e")))
    return {}


AFTERGLOW_URI = "http://odahub.io/ontology/afterglow"


def x_clearly_detected_afterglow(text: str, side: SideTables) -> dict:
    """facts/gcn.py:465-472."""
    T = collapse_ws(text)
    if re.search("clearly detected", T) and re.search("afterglow", T):
        return dict(reports_characteristic=AFTERGLOW_URI)
    return {}


def x_gcn_cites(text: str, side: SideTables) -> dict:
    """facts/gcn.py:475-477."""
    return cites_common("", text)


def x_afterglow(text: str, side: SideTables) -> dict:
    """facts/gcn.py:480-487."""
    if re.search("afterglow", collapse_ws(text)):
        return dict(reports_characteristic=AFTERGLOW_URI)
    return {}


def x_gcn_grb_integral_circular(text: str, side: SideTables) -> dict:
    """facts/gcn.py:491-507 (UTC assembled from the GRB name digits)."""
    r = re.search("SUBJECT:.*?(GRB.*?):.*INTEGRAL.*", text, re.I)
    r_t = re.search(r"(\d\d:\d\d:\d\d) +UT", text, re.I)
    if r is not None and r_t is not None:
        grbname = r.groups()[0].strip()
        grbtime = r_t.groups()[0].strip()
        date = grbname.replace("GRB", "").strip()
        utc = "20" + date[:2] + "-" + date[2:4] + "-" + date[4:6] + " " + grbtime
        return dict(integral_grb_report=grbname, event_t0=utc)
    return {}


def x_gcn_lvc_integral_counterpart(text: str, side: SideTables) -> dict:
    """facts/gcn.py:510-518."""
    if re.search("SUBJECT:.*?(LIGO/Virgo .*?):.*INTEGRAL", text, re.I) is not None:
        return dict(lvc_counterpart_by="INTEGRAL")
    return {}


def x_gcn_hawc(text: str, side: SideTables) -> dict:
    """facts/gcn.py:521-565 (hawc/event ra+dec are floats here)."""
    r = re.search(r"SUBJECT:.*?\b(HAWC[\- ]?[0-9]+?[A-Z]?)\b", text, re.I)
    d: dict = {}
    if r is None:
        return d
    ev = r.group(1)
    d = dict(reports_hawc_event=ev.strip(), reports_event=ev.strip())
    r_t = re.search(
        r"On (?P<date_time>\d{2} \d{2}, \d{4}, at \d{2}:\d{2}:[\d\.]{2,}) UTC", text
    )
    if r_t:
        d["grb_isot"] = datetime.strptime(
            r_t.group("date_time").strip(), "%m %d, %Y, at %H:%M:%S.%f"
        ).strftime("%Y-%m-%dT%H:%M:%S.%f")
        d["event_isot"] = d["grb_isot"]
    r_ra = re.search(r"RA.*?: (?P<ra>[\d\.\-\+]*?) ", text)
    if r_ra is not None:
        d["hawc_ra"] = float(r_ra.group("ra"))
        d["event_ra"] = float(r_ra.group("ra"))
    r_dec = re.search(r"Dec.*?: (?P<dec>[\d\.\-\+]*?) ", text)
    if r_dec is not None:
        d["hawc_dec"] = float(r_dec.group("dec"))
        d["event_dec"] = float(r_dec.group("dec"))
    return d


def x_submitter(text: str, side: SideTables) -> dict:
    """facts/gcn.py:568-577."""
    r = re.search("FROM:(.*?)<(.*?)>\n", text, re.M | re.S)
    if r is not None:
        return dict(
            gcn_from_name=r.groups()[0].strip(),
            gcn_from_email=r.groups()[1].strip(),
        )
    return {}


def x_authors(text: str, side: SideTables) -> dict:
    """facts/gcn.py:579-589 (first blank-line block after FROM:)."""
    T = re.sub("\r", "", text)
    r = re.search("FROM:.*?\n\n(.*?)\n\n", T, re.M | re.S)
    if r is not None:
        return dict(gcn_authors=r.groups()[0].replace("\n", " ").strip())
    return {}


def x_gcn_ads_data(text: str, side: SideTables) -> dict:
    """adsabs.py:14-38 plugin — ADS query replaced by a side table keyed on
    the (stripped) SUBJECT from gcn_meta; only subjects containing the
    case-sensitive substring "INTEGRAL" are looked up (adsabs.py:19).

    Side values may be a list (one entry per ADS response doc): the
    reference asserts exactly one doc (adsabs.py:31), so an ambiguous
    response raises — the extractor contributes no facts.  A plain string
    means one doc (back-compat fixture shape)."""
    m = gcn_meta_fields(text)
    if "INTEGRAL" in m["SUBJECT"]:
        docs = side.ads_authors[m["SUBJECT"]]  # KeyError == lookup failure
        if isinstance(docs, str):
            docs = [docs]
        assert len(docs) == 1  # adsabs.py:31 — ambiguous ADS answer -> raise
        return dict(gcn_authors=docs[0])
    return {}


# Registry order mirrors the reference module definition order
# (facts/gcn.py top-to-bottom; plugin last, as `-m adsabs` would append it).
GCN_EXTRACTORS: list[tuple[str, Callable]] = [
    ("gcn_instrument", x_gcn_instrument),
    ("mentions_keyword", x_gcn_mentions_keyword),
    ("mentions_named", x_gcn_mentions_named),
    ("fermi_realtime", x_fermi_realtime),
    ("fermi_v2", x_fermi_v2),
    ("gbm_balrog", x_gbm_balrog),
    ("swift_detected", x_swift_detected),
    ("swift_trigger_id", x_swift_trigger_id),
    ("gcn_meta", x_gcn_meta),
    ("gcn_date", x_gcn_date),
    ("gcn_named", x_gcn_named),
    ("gcn_lvc_event", x_gcn_lvc_event),
    ("gcn_integral_lvc_countepart_search", x_gcn_integral_lvc_countepart_search),
    ("gcn_integral_countepart_search", x_gcn_integral_countepart_search),
    ("gcn_icecube_circular", x_gcn_icecube_circular),
    ("gcn_lvc_circular", x_gcn_lvc_circular),
    ("integral_ul_old_variation", x_integral_ul_old_variation),
    ("integral_ul", x_integral_ul),
    ("clearly_detected_afterglow", x_clearly_detected_afterglow),
    ("cites", x_gcn_cites),
    ("afterglow", x_afterglow),
    ("gcn_grb_integral_circular", x_gcn_grb_integral_circular),
    ("gcn_lvc_integral_counterpart", x_gcn_lvc_integral_counterpart),
    ("gcn_hawc", x_gcn_hawc),
    ("submitter", x_submitter),
    ("authors", x_authors),
    ("gcn_ads_data", x_gcn_ads_data),
]


# ---------------------------------------------------------------------------
# ATel extractors (facts/atel.py) — operate on the parsed entry dict
# ---------------------------------------------------------------------------

def atel_identity(entry: dict) -> str:
    """facts/atel.py:179-181."""
    return paperid_to_uri("atel", int(entry["atelid"].split("/")[-1]))


def x_atel_date(entry: dict, side: SideTables) -> dict:
    """facts/atel.py:31-36 (naive timestamp, TZ pinned UTC)."""
    t = datetime.strptime(entry["date"].strip(), "%d %b %Y; %H:%M UT").timestamp()
    return dict(timestamp=t)


def x_atel_tags(entry: dict, side: SideTables) -> dict:
    """facts/atel.py:39-41."""
    return dict(topics=[tag.strip().lower() for tag in entry["tags"].split(",")])


def x_atel_mentions_keyword(entry: dict, side: SideTables) -> dict:
    """facts/atel.py:148-150."""
    return mentions_keyword_common(entry["title"], entry["body"])


def x_atel_mentions_named(entry: dict, side: SideTables) -> dict:
    """facts/atel.py:153-155."""
    return mentions_grblike_common(entry["title"], entry["body"])


def x_atel_cites(entry: dict, side: SideTables) -> dict:
    """facts/atel.py:158-160."""
    return cites_common(entry["title"], entry["body"])


def x_atel_basic_meta(entry: dict, side: SideTables) -> dict:
    """facts/atel.py:163-170."""
    return dict(
        location=entry["url"],
        title=re.sub(r"[\n\r]", " ", entry["title"]),
        source="ATel",
        atelid=entry["atelid"],
    )


ATEL_EXTRACTORS: list[tuple[str, Callable]] = [
    ("atel_date", x_atel_date),
    ("atel_tags", x_atel_tags),
    ("mentions_keyword", x_atel_mentions_keyword),
    ("mentions_named", x_atel_mentions_named),
    ("cites", x_atel_cites),
    ("basic_meta", x_atel_basic_meta),
]


# ---------------------------------------------------------------------------
# arXiv extractors (facts/arxiv.py)
# ---------------------------------------------------------------------------

ARXIV_KEYWORDS = ("INTEGRAL", "FRB", "GRB", "GW170817", "GW190425", "magnetar", "SGR")


def arxiv_identity(entry: dict) -> str:
    """facts/arxiv.py:130-132 (id suffix kept verbatim, NOT int-coerced)."""
    return f"{PAPER_NS}#arXiv" + entry["id"].split("/")[-1]


def x_arxiv_basic_meta(entry: dict, side: SideTables) -> dict:
    """facts/arxiv.py:87-93."""
    return dict(
        location=entry["id"],
        title=re.sub(r"[\n\r]", " ", entry["title"]),
        source="arXiv",
    )


def x_arxiv_basic_time_meta(entry: dict, side: SideTables) -> dict:
    """facts/arxiv.py:95-102."""
    updated_ts = datetime.fromisoformat(entry["updated"].replace("Z", "")).timestamp()
    return dict(updated_isot=entry["updated"], updated_ts=updated_ts, timestamp=updated_ts)


def x_arxiv_mentions_keyword(entry: dict, side: SideTables) -> dict:
    """facts/arxiv.py:105-120 (field loop title->summary; summary wins; the
    ``_times`` value here is the count of the field that set it last)."""
    d: dict = {}
    for keyword in ARXIV_KEYWORDS:
        k = keyword.lower()
        for fieldname in ("title", "summary"):
            n = len(re.findall(keyword, entry[fieldname]))
            if n > 0:
                d["mentions_" + k] = fieldname
            if n > 1:
                d["mentions_" + k + "_times"] = n
    return d


ARXIV_EXTRACTORS: list[tuple[str, Callable]] = [
    ("basic_meta", x_arxiv_basic_meta),
    ("basic_time_meta", x_arxiv_basic_time_meta),
    ("mentions_keyword", x_arxiv_mentions_keyword),
]


# ---------------------------------------------------------------------------
# Document decoding: raw web-page text -> per-kind document object
# ---------------------------------------------------------------------------

ATEL_FIELD_SPECS = [
    ("Title", "title", "Author:"),
    ("Author", "authors", "Queries:"),
    ("Queries", "submitter_email", "Posted:"),
    ("Posted", "date", "Subjects:"),
    ("Subjects", "tags", "\n\n"),
]


def parse_atel_email_text(raw: str) -> dict:
    """facts/atel.py:74-101 (email payload = text after the first blank
    line, per ``email.parser`` on a non-multipart message)."""
    atel_text = raw.split("\n\n", 1)[1]
    entry: dict = {}
    for atel_field, fieldname, endt in ATEL_FIELD_SPECS:
        m = re.search(f"{atel_field}:(.*?)(?={endt})", atel_text, re.S)
        entry[fieldname] = re.sub("[\t\r\n]+", " ", m.group(1)).strip()
    entry["authors"] = entry["authors"].split(";", 1)[-1].strip()
    entry["atelid"] = re.search(r"ATEL #(\d+)", atel_text).group(1).strip()
    entry["url"] = f"https://www.astronomerstelegram.org/?read={entry['atelid']}"
    body = re.search(r"Subjects:.*?\n\n(.*?)[=\-]{20,}", atel_text, re.S).group(1)
    entry["body"] = re.sub("[\n\r\t ]+", " ", body)
    return entry


def parse_arxiv_json_text(raw: str) -> dict:
    """arXiv docs carry the Atom-feed entry as a JSON object in ``text``
    (keys used by the reference: id, title, summary, updated —
    facts/arxiv.py:88-120)."""
    import json

    return json.loads(raw)


def decode_doc(kind: str, text: str):
    if kind == "gcn":
        return text
    if kind == "atel":
        return parse_atel_email_text(text)
    if kind == "arxiv":
        return parse_arxiv_json_text(text)
    raise ValueError(f"no decoder for kind {kind!r}")


# ---------------------------------------------------------------------------
# Engine semantics (facts/core.py:70-143)
# ---------------------------------------------------------------------------

KIND_TABLES = {
    "gcn": (gcn_identity, GCN_EXTRACTORS),
    "atel": (atel_identity, ATEL_EXTRACTORS),
    "arxiv": (arxiv_identity, ARXIV_EXTRACTORS),
}

# plugin kinds: kind -> (identity_fn_or_None, extractors, type_name).
# identity None models an input type with NO identity workflow: the
# reference's workflow_id default then mints the problematic subject
# (facts/core.py:54) instead of failing.
PLUGIN_KIND_TABLES: dict[str, tuple] = {}


def register_shim_kind(
    kind: str, extractors: list, type_name: str, identity_fn: Optional[Callable] = None
) -> None:
    PLUGIN_KIND_TABLES[kind] = (identity_fn, extractors, type_name)


def unregister_shim_kind(kind: str) -> None:
    PLUGIN_KIND_TABLES.pop(kind, None)


def problematic_id(type_name: str, doc) -> str:
    """facts/core.py:54: ``paper#problematic<TypeName><sha224(repr(v))[:8]>``."""
    import hashlib

    return (
        PAPER_NS
        + "#problematic"
        + type_name
        + hashlib.sha224(repr(doc).encode()).hexdigest()[:8]
    )


def gcn_extractors():
    return GCN_EXTRACTORS


def atel_extractors():
    return ATEL_EXTRACTORS


def arxiv_extractors():
    return ARXIV_EXTRACTORS


def extract_doc_facts(kind: str, doc, side: Optional[SideTables] = None) -> tuple[str, list[tuple[str, str, str]]]:
    """Run the extractor battery over one document; return (subj_uri, triples).

    Semantics of facts/core.py:70-123:
    * identity failure raises (the doc is unprocessable);
    * each extractor's exception is swallowed -> it contributes no facts;
    * empty dicts are skipped; list values fan out to one triple per element;
    * objects are rendered as ``rdflib.Literal(v).n3()``;
    * the "valuable" filter keeps the doc's facts only if the substring
      ``mentions`` appears in any joined triple line (facts/core.py:121-123).
    """
    side = side or SideTables()
    if kind in KIND_TABLES:
        identity_fn, extractors = KIND_TABLES[kind]
        subj_uri = identity_fn(doc)  # raises -> doc unprocessable
    else:
        identity_fn, extractors, type_name = PLUGIN_KIND_TABLES[kind]
        if identity_fn is not None:
            subj_uri = identity_fn(doc)  # reference re-raises identity errors
        else:
            subj_uri = problematic_id(type_name, doc)  # facts/core.py:54
    ns, cid = subj_uri.split("#")
    subj = f"<{ns}#{cid}>"

    triples: list[tuple[str, str, str]] = []
    for _name, fn in extractors:
        try:
            o = fn(doc, side)
            if len(o) == 0:
                continue
            for k, v in o.items():
                vs = v if isinstance(v, list) else [v]
                for _v in vs:
                    triples.append((subj, f"<{ns}#{k}>", literal_n3(_v)))
        except Exception:
            continue

    if not any("mentions" in " ".join(f) for f in triples):
        return cid, []
    return cid, triples


def dict_view_of_facts(triples: list[tuple[str, str, str]]) -> dict:
    """facts/core.py:128-133: group by predicate, parse literals back,
    single value -> scalar, multiple -> sorted(set(...))."""
    D: dict = {}
    for _s, p, o in triples:
        key = p.replace(f"{PAPER_NS}#", "paper:").strip("<>")
        D.setdefault(key, []).append(from_n3(o))
    return {k: v[0] if len(v) == 1 else list(sorted(set(v))) for k, v in D.items()}
