"""Vectorized GCN-circular extractors (batch re-expression of facts/gcn.py).

Every function takes the prepared batch DataFrame (see :func:`prepare_gcn`)
and returns ``{predicate: pd.Series}``.  Regex strings are the reference's
spec, cited per function; scans run via pandas ``.str`` ops over the whole
Arrow batch; ``pd.to_datetime(..., errors='coerce')`` models the reference's
"extractor exception -> contributes nothing" rule (facts/core.py:114-115),
with explicit masks where a mid-extractor exception must drop sibling fields.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from literature_to_facts_spark.extractors import common as vcommon
from literature_to_facts_spark.extractors.base import DYNAMIC, ExtractorSpec, Sides, gated
from literature_to_facts_spark.functions.literals import PAPER_NS
from literature_to_facts_spark.functions.textnorm import (
    collapse_nl_24_series,
    collapse_space_nl_series,
    collapse_ws_series,
)
from literature_to_facts_spark.shim.reference_shim import (
    AFTERGLOW_URI,
    parse_amon_notice_block,
)

_EPOCH = pd.Timestamp("1970-01-01")

_INT_RE = re.compile(r"^[+-]?\d+$")


def _epoch_seconds(parsed: pd.Series) -> pd.Series:
    """Naive datetime -> POSIX float under the pinned UTC TZ."""
    return (parsed - _EPOCH) / pd.Timedelta(seconds=1)


def _strf(parsed: pd.Series, fmt: str) -> pd.Series:
    out = parsed.dt.strftime(fmt)
    return out.where(parsed.notna(), None).astype(object)


def prepare_gcn(docs: pd.DataFrame) -> tuple[pd.DataFrame, int]:
    """Shared per-batch prep (manual CSE of the reference's repeated
    whitespace normalizations, SURVEY.md §4) + identity.

    Returns (prep, n_identity_failures).  Docs whose NUMBER header is missing
    or non-integer are unprocessable (facts/gcn.py:59-67: identity raises)
    and are dropped here, counted for lineage metrics.
    """
    text = docs["text"]
    number_raw = text.str.extract(r"NUMBER:(.*)", expand=False)
    number_str = number_raw.str.strip()
    ok = number_str.notna() & number_str.str.match(_INT_RE)
    n_bad = int((~ok).sum())

    prep = pd.DataFrame(index=docs.index)
    prep["url"] = docs["url"]
    prep["text"] = text
    prep = prep[ok].copy()
    num = prep["text"].str.extract(r"NUMBER:(.*)", expand=False).str.strip()
    gcn_id = num.astype("int64")
    prep["subj"] = (PAPER_NS + "#gcn") + gcn_id.astype(str)
    prep["t_ws"] = collapse_ws_series(prep["text"])
    prep["t_snl"] = collapse_space_nl_series(prep["text"])
    prep["t_24"] = collapse_nl_24_series(prep["text"])
    prep["subject"] = prep["text"].str.extract(r"SUBJECT:(.*)", expand=False).str.strip()
    prep["date_hdr"] = prep["text"].str.extract(r"DATE:(.*)", expand=False).str.strip()
    prep["number_hdr"] = num
    return prep, n_bad


# --- instrument / keyword / NER / cites -----------------------------------

def x_gcn_instrument(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:88-101."""
    flags = [
        p["text"].str.contains(f"SUBJECT:.*{m}.*", regex=True)
        for m in ("Fermi/GBM", "Fermi GBM", "Fermi/LAT", "AGILE")
    ]
    names = ["fermi-gbm", "fermi-gbm", "fermi-lat", "agile"]
    arr = np.column_stack([f.fillna(False).to_numpy() for f in flags])
    instruments = [
        [names[j] for j in range(4) if row[j]] for row in arr
    ]
    return {"instrument": pd.Series(instruments, index=p.index, dtype=object)}


def x_mentions_keyword(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:104-106 (title='', body=full text)."""
    empty = pd.Series([""] * len(p), index=p.index)
    return vcommon.mentions_keyword_batch(empty, p["text"])


def x_mentions_named(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:109-111."""
    empty = pd.Series([""] * len(p), index=p.index)
    return vcommon.mentions_grblike_batch(empty, p["text"])


def x_cites(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:475-477."""
    empty = pd.Series([""] * len(p), index=p.index)
    return vcommon.cites_batch(empty, p["text"])


# --- Fermi -----------------------------------------------------------------

def x_fermi_realtime(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:114-138.  A matched-but-unparseable time raises in the
    reference mid-extractor -> the coord fields are dropped with it."""
    time_g = p["text"].str.extract(
        r"At (.*?), the Fermi Gamma-ray Burst Monitor \(GBM\) triggered",
        expand=False,
    )
    parsed = pd.to_datetime(
        time_g.str.strip(), format="%H:%M:%S UT on %d %b %Y", errors="coerce"
    )
    failed = time_g.notna() & parsed.isna()

    coords = p["text"].str.extract(
        r"The on-ground calculated location, using the Fermi GBM trigger data.*?"
        r"RA = (?P<ra>[\d\.\-\+]*?), Dec = (?P<dec>[\d\.\-\+]*?) .*?"
        r"with a statistical uncertainty of (?P<rad>[\d\.\-\+]*?) degrees."
    )
    out = {
        "grb_isot": _strf(parsed, "%Y-%m-%dT%H:%M:%S"),
        "gbm_ra": coords["ra"].astype(object),
        "gbm_dec": coords["dec"].astype(object),
        "gbm_rad": coords["rad"].astype(object),
    }
    for k in out:
        out[k] = out[k].where(~failed, None)
    return out


def x_fermi_v2(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:140-153 (space+newline collapse, microsecond format)."""
    g = p["t_snl"].str.extract(
        r"At (?P<grb_date>[0-9:\.]*? UT on [0-9]{1,2} [a-zA-Z]*? [0-9]{4}?).*?, "
        r"the Fermi Gamma-Ray Burst Monitor \(GBM\) triggered and located "
        r"(?P<name>GRB [0-9]{6}[A-G])"
    )
    parsed = pd.to_datetime(
        g["grb_date"].str.strip(), format="%H:%M:%S.%f UT on %d %B %Y", errors="coerce"
    )
    return {"grb_isot": _strf(parsed, "%Y-%m-%dT%H:%M:%S.%f")}


def x_gbm_balrog(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:155-174 — the JSON fetch becomes a broadcast join against
    the pre-fetched balrog side table; a missing key drops ALL fields (the
    reference's fetch would raise before returning)."""
    url_json = p["text"].str.extract(r"(?P<url_json>https://.*?json)", expand=False)
    m = pd.DataFrame({"url_json": url_json})
    if len(side.balrog):
        m = m.merge(side.balrog, on="url_json", how="left")
        m.index = p.index
        hit = url_json.notna() & m["grb_isot"].notna()
        return {
            "url_json": url_json.where(hit, None),
            "url": url_json.str.replace("/json", "/", regex=False).where(hit, None),
            "grb_isot": m["grb_isot"].str.replace("Z", "", regex=False).where(hit, None).astype(object),
            "gbm_trigger_id": pd.Series(
                [
                    int(v) if h and not pd.isna(v) else None
                    for v, h in zip(m["gbm_trigger_id"].to_numpy(), hit.to_numpy())
                ],
                index=p.index,
                dtype=object,
            ),
            "balrog_ra": m["balrog_ra"].where(hit, None).astype(object),
            "balrog_ra_err": m["balrog_ra_err"].where(hit, None).astype(object),
            "balrog_dec": m["balrog_dec"].where(hit, None).astype(object),
            "balrog_dec_err": m["balrog_dec_err"].where(hit, None).astype(object),
        }
    return {}


# --- Swift -----------------------------------------------------------------

def x_swift_detected(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:177-194 (count=24 collapse; GRB-name last char stripped)."""
    g = p["t_24"].str.extract(
        r"At (.*?) UT, the Swift Burst Alert Telescope \(BAT\) triggered "
        r"and located (GRB ?.*?) "
    )
    assembled = (
        g[0].str.strip()
        + " "
        + g[1].str.strip().str.slice(0, -1).str.replace(" ", "", regex=False)
    )
    parsed = pd.to_datetime(assembled, format="%H:%M:%S GRB%y%m%d", errors="coerce")
    return {"grb_isot": _strf(parsed, "%Y-%m-%dT%H:%M:%S")}


def x_swift_trigger_id(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:196-210."""
    is_swift = p["t_24"].str.contains(r"SUBJECT: .*?Swift detection", regex=True)
    trig = p["t_24"].str.extract(r"trigger=([0-9]+)", expand=False)
    hit = is_swift.fillna(False) & trig.notna()
    trig_vals = trig.to_numpy(dtype=object)
    hit_vals = hit.to_numpy()
    return {
        "swift_trigger_id": pd.Series(
            [int(trig_vals[i]) if hit_vals[i] else None for i in range(len(trig_vals))],
            index=p.index,
            dtype=object,
        ),
        "detected_by": pd.Series(np.where(hit, "swift", None), index=p.index, dtype=object),
    }


# --- headers ----------------------------------------------------------------

def x_gcn_meta(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:214-227: DATE/SUBJECT/NUMBER + derived fields.  A missing
    SUBJECT raises at ``d['title']`` -> everything from this extractor drops
    (NUMBER presence is already guaranteed by identity)."""
    ok = p["subject"].notna()
    return {
        "DATE": p["date_hdr"].where(ok, None).astype(object),
        "SUBJECT": p["subject"].where(ok, None).astype(object),
        "NUMBER": p["number_hdr"].where(ok, None).astype(object),
        "location": (
            "https://gcn.gsfc.nasa.gov/gcn3/" + p["number_hdr"] + ".gcn3"
        ).where(ok, None).astype(object),
        "title": p["subject"].where(ok, None).astype(object),
        "source": pd.Series(np.where(ok, "GCN", None), index=p.index, dtype=object),
    }


def x_gcn_date(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:230-235 (requires gcn_meta to succeed first)."""
    ok = p["subject"].notna()
    parsed = pd.to_datetime(
        p["date_hdr"].where(ok, None), format="%y/%m/%d %H:%M:%S GMT", errors="coerce"
    )
    ts = _epoch_seconds(parsed)
    return {"timestamp": ts.where(parsed.notna(), None).astype(object)}


def x_gcn_named(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:237-246."""
    g = p["text"].str.extract(r"SUBJECT: *(GRB.*?):.*", flags=re.I, expand=False)
    return {
        "mentions_named_grb": g.str.strip().str.replace(" ", "", regex=False).astype(object)
    }


# --- LVC / INTEGRAL ----------------------------------------------------------

def _lvc_event_body(p: pd.DataFrame) -> dict:
    ev = p["text"].str.extract(r"SUBJECT: *(LIGO/Virgo.*?):", flags=re.I, expand=False)
    utc = p["t_ws"].str.extract(
        r"at (\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d*?) UTC", flags=re.I, expand=False
    )
    return {
        "lvc_event": ev.str.strip().astype(object),
        "lvc_event_utc": utc.str.strip().where(ev.notna(), None).astype(object),
    }


def x_gcn_lvc_event(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:248-265.  Both outputs need "LIGO/Virgo" in the subject."""
    return gated(
        p, p["text"].str.contains("ligo/virgo", case=False, regex=False), _lvc_event_body
    )


def x_gcn_integral_lvc_countepart_search(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:267-284 (fields independent — gated separately: the event
    regex needs "INTEGRAL", the T0 regex its own literal tail)."""
    out: dict = {}
    out.update(
        gated(
            p,
            p["text"].str.contains("integral", case=False, regex=False),
            lambda s: {
                "original_event": s["text"]
                .str.extract(r"SUBJECT: *(LIGO/Virgo.*?):.*INTEGRAL", flags=re.I, expand=False)
                .str.strip()
                .astype(object)
            },
        )
    )
    out.update(
        gated(
            p,
            p["text"].str.contains("hereafter T0", regex=False),
            lambda s: {
                "original_event_utc": s["text"]
                .str.extract(
                    r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:[\d\.]+?) UTC, hereafter T0",
                    expand=False,
                )
                .str.strip()
                .astype(object)
            },
        )
    )
    return out


def _integral_countepart_body(p: pd.DataFrame) -> dict:
    e1 = p["text"].str.extract(r"SUBJECT:(.*?):.*counterpart.*INTEGRAL", flags=re.I, expand=False)
    e2 = p["text"].str.extract(r"SUBJECT:(.*?):.*INTEGRAL.*counterpart.*", flags=re.I, expand=False)
    e3 = p["text"].str.extract(r"SUBJECT:(.*?):.*associated.*INTEGRAL.*", flags=re.I, expand=False)
    ev = e1.fillna(e2).fillna(e3)
    t0 = p["text"].str.extract(
        r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:[\d\.]+?) UTC, hereafter T0", expand=False
    )
    hit = ev.notna() & t0.notna()
    has_acs = p["text"].str.contains(r"SUBJECT:(?:.*?):.*ACS.*", flags=re.I).fillna(False)
    has_ibis = p["text"].str.contains(r"SUBJECT:(?:.*?):.*IBIS.*", flags=re.I).fillna(False)
    arr = np.column_stack([has_acs.to_numpy(), has_ibis.to_numpy(), hit.to_numpy()])
    instruments = [
        (["acs"] if row[0] else []) + (["ibis"] if row[1] else []) if row[2] else None
        for row in arr
    ]
    return {
        "original_event": ev.str.strip().where(hit, None).astype(object),
        "original_event_utc": t0.str.strip().where(hit, None).astype(object),
        "instrument": pd.Series(instruments, index=p.index, dtype=object),
    }


def x_gcn_integral_countepart_search(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:287-318 (three fallback subject regexes; both event and
    T0 required; acs/ibis sub-flags).  Every output needs "INTEGRAL" in the
    text, so the five dot-star regexes run on that subset only."""
    return gated(
        p,
        p["text"].str.contains("integral", case=False, regex=False),
        _integral_countepart_body,
    )


def x_gcn_lvc_circular(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:418-426."""
    return gated(
        p,
        p["text"].str.contains("ligo/virgo", case=False, regex=False),
        lambda s: {
            "lvc_event_report": s["text"]
            .str.extract(r"SUBJECT:.*?(LIGO/Virgo .*?): Identification", flags=re.I, expand=False)
            .str.strip()
            .astype(object)
        },
    )


def x_gcn_lvc_integral_counterpart(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:510-518."""

    def body(s: pd.DataFrame) -> dict:
        hit = s["text"].str.contains(
            r"SUBJECT:.*?(?:LIGO/Virgo .*?):.*INTEGRAL", flags=re.I
        ).fillna(False)
        return {
            "lvc_counterpart_by": pd.Series(
                np.where(hit, "INTEGRAL", None), index=s.index, dtype=object
            )
        }

    return gated(p, p["text"].str.contains("integral", case=False, regex=False), body)


def x_gcn_grb_integral_circular(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:491-507 (event_t0 assembled from the GRB-name digits).
    Both outputs require "INTEGRAL" in the subject line."""

    def body(s: pd.DataFrame) -> dict:
        name = s["text"].str.extract(r"SUBJECT:.*?(GRB.*?):.*INTEGRAL.*", flags=re.I, expand=False)
        t = s["text"].str.extract(r"(\d\d:\d\d:\d\d) +UT", flags=re.I, expand=False)
        hit = name.notna() & t.notna()
        grbname = name.str.strip()
        date = grbname.str.replace("GRB", "", regex=False).str.strip()
        utc = (
            "20" + date.str.slice(0, 2) + "-" + date.str.slice(2, 4) + "-"
            + date.str.slice(4, 6) + " " + t.str.strip()
        )
        return {
            "integral_grb_report": grbname.where(hit, None).astype(object),
            "event_t0": utc.where(hit, None).astype(object),
        }

    return gated(p, p["text"].str.contains("integral", case=False, regex=False), body)


# --- upper limits / afterglow ------------------------------------------------

def _float_from_ul(s: pd.Series) -> pd.Series:
    vals = s.str.strip().str.replace("x10^", "e", regex=False)
    out = pd.to_numeric(vals, errors="coerce")
    return pd.Series(
        [float(v) if not pd.isna(v) else None for v in out], index=s.index, dtype=object
    )


def x_integral_ul_old_variation(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:429-450 (four fallback phrasings over collapsed text).
    Every phrasing contains the literal "erg/cm" — gate on it (ci: r2 runs
    under re.I)."""

    def body(s: pd.DataFrame) -> dict:
        T = s["t_ws"]
        r1 = T.str.extract(r"upper limit .*? ([\d\.e\-]*?) erg/cm.*? for a 1 s duration", expand=False)
        r2 = T.str.extract(r"We find a limiting fluence of ([\d\.e\-]*?) erg/cm", flags=re.I, expand=False)
        r3 = T.str.extract(r"([\d\.e\-]*?) erg/cm2 for 1 s", expand=False)
        r4 = T.str.extract(r"limiting peak flux is ~([\d\.e\-\^x]*?) erg/cm.*? at 1 s time scale", expand=False)
        merged = r1.fillna(r2).fillna(r3).fillna(r4)
        return {"integral_ul": _float_from_ul(merged)}

    return gated(p, p["t_ws"].str.contains("erg/cm", case=False, regex=False), body)


def x_integral_ul(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:453-462."""

    def body(s: pd.DataFrame) -> dict:
        g = s["t_ws"].str.extract(
            r"upper limit on the 75-2000 keV fluence of ([\d\.e\-\^x]*?) *?erg/cm", expand=False
        )
        return {"integral_ul": _float_from_ul(g)}

    return gated(p, p["t_ws"].str.contains("erg/cm", case=False, regex=False), body)


def x_clearly_detected_afterglow(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:465-472."""
    hit = (
        p["t_ws"].str.contains("clearly detected").fillna(False)
        & p["t_ws"].str.contains("afterglow").fillna(False)
    )
    return {
        "reports_characteristic": pd.Series(
            np.where(hit, AFTERGLOW_URI, None), index=p.index, dtype=object
        )
    }


def x_afterglow(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:480-487."""
    hit = p["t_ws"].str.contains("afterglow").fillna(False)
    return {
        "reports_characteristic": pd.Series(
            np.where(hit, AFTERGLOW_URI, None), index=p.index, dtype=object
        )
    }


def prepare_ads_side(ads: pd.DataFrame) -> pd.DataFrame:
    """ADS strictness (adsabs.py:31 ``assert len(docs) == 1``): the raw side
    table holds one row per ADS response doc; only subjects with EXACTLY one
    doc yield authors — an ambiguous answer makes the reference's assert
    raise, so the workflow contributes no facts for that subject.  Filtering
    here (driver side, once) keeps the executor join a plain key lookup."""
    if ads is None or not len(ads):
        return pd.DataFrame(columns=["subject", "gcn_authors"])
    n = ads.groupby("subject")["subject"].transform("size")
    return ads[n == 1].copy()


# --- IceCube -----------------------------------------------------------------

def prepare_amon_side(amon: pd.DataFrame) -> pd.DataFrame:
    """Pre-parse AMON notice blocks once (driver side) into per-url fields.

    Columns: url, fields (dict of amon_gcn_notice_* incl. floats), isot
    (pre-assembled event_isot or None), invalid (bool: the reference would
    raise RuntimeError/ValueError -> docs joined to it emit nothing).
    """
    from datetime import datetime as _dt

    rows = []
    for _, r in amon.iterrows():
        fields: dict = {}
        invalid = False
        isot = None
        try:
            fields = parse_amon_notice_block(r["notice_text"])
            if (
                "amon_gcn_notice_time_hms" in fields
                and "amon_gcn_notice_date_ymd" in fields
            ):
                isot = _dt.strptime(
                    fields["amon_gcn_notice_date_ymd"] + " " + fields["amon_gcn_notice_time_hms"],
                    "%y/%m/%d %H:%M:%S.%f",
                ).strftime("%Y-%m-%dT%H:%M:%S.%f")
        except Exception:
            invalid = True
        rows.append({"url": r["url"], "fields": fields, "isot": isot, "invalid": invalid})
    return pd.DataFrame(rows, columns=["url", "fields", "isot", "invalid"])


def x_gcn_icecube_circular(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:321-415 — gated: `drop = ~is_ic | ...` nulls every output
    unless the "IceCube observation" subject matches, so only docs containing
    "icecube" need the AMON join + regex battery."""
    return gated(
        p,
        p["text"].str.contains("icecube", case=False, regex=False),
        lambda s: _icecube_body(s, side),
    )


def _icecube_body(p: pd.DataFrame, side: Sides) -> dict:
    g = p["text"].str.extract(
        r"SUBJECT:(.*?) *?:?-? *?IceCube observation of a(.*)", flags=re.I
    )
    is_ic = g[0].notna()
    ev = g[0].str.strip()
    descr = g[1].str.strip()

    notice_url = p["text"].str.extract(
        r"(https://gcn.gsfc.nasa.gov/.*?\.amon)", expand=False
    )
    has_url = notice_url.notna()

    # AMON path (join)
    amon_fields = pd.Series([None] * len(p), index=p.index, dtype=object)
    amon_isot = pd.Series([None] * len(p), index=p.index, dtype=object)
    amon_invalid = pd.Series([False] * len(p), index=p.index)
    if len(side.amon):
        m = pd.DataFrame({"url": notice_url}).merge(side.amon, on="url", how="left")
        m.index = p.index
        joined = has_url & m["fields"].notna()
        amon_fields = m["fields"].where(joined, None)
        amon_isot = m["isot"].where(joined, None)
        amon_invalid = (has_url & (~joined)) | m["invalid"].fillna(False).astype(bool)
    else:
        amon_invalid = has_url  # fetch would fail

    # inline path
    inline = is_ic & ~has_url
    dt_g = p["text"].str.extract(
        r"On (?P<date_time>\d{4}[/\- ]\d{2}[/\- ]\d{2} at \d{2}:\d{2}:[\d\.]*?) UT IceCube",
        expand=False,
    )
    parsed = pd.to_datetime(
        dt_g.str.strip().str.replace("-", "/", regex=False),
        format="%Y/%m/%d at %H:%M:%S.%f",
        errors="coerce",
    )
    inline_isot = _strf(parsed, "%Y-%m-%dT%H:%M:%S.%f")
    inline_failed = dt_g.notna() & parsed.isna()  # reference raises -> drop all
    ra = p["text"].str.extract(r"RA: (?P<ra>[\d\.\-\+]*?) ", expand=False)
    dec = p["text"].str.extract(r"Dec: (?P<dec>[\d\.\-\+]*?) ", expand=False)

    drop = (~is_ic) | (has_url & amon_invalid) | (inline & inline_failed)
    keep = ~drop

    out: dict = {
        "reports_icecube_event": ev.where(keep, None).astype(object),
        "reports_event": ev.where(keep, None).astype(object),
        "icecube_event_descr": descr.where(keep, None).astype(object),
    }

    ic_ra = ra.where(keep & inline, None)
    ic_dec = dec.where(keep & inline, None)
    out["icecube_ra"] = ic_ra.astype(object)
    out["icecube_dec"] = ic_dec.astype(object)

    # event_ra/dec with the reference's precedence ladder
    event_ra = pd.Series([None] * len(p), index=p.index, dtype=object)
    event_dec = pd.Series([None] * len(p), index=p.index, dtype=object)
    event_isot = pd.Series([None] * len(p), index=p.index, dtype=object)
    dynamic = pd.Series([None] * len(p), index=p.index, dtype=object)

    for i in p.index[keep]:
        if has_url.at[i]:
            fields = amon_fields.at[i] or {}
            dynamic.at[i] = fields
            if (
                "amon_gcn_notice_src_ra" in fields
                and "amon_gcn_notice_src_dec" in fields
            ):
                event_ra.at[i] = fields["amon_gcn_notice_src_ra"]
                event_dec.at[i] = fields["amon_gcn_notice_src_dec"]
            if amon_isot.at[i] is not None:
                event_isot.at[i] = amon_isot.at[i]
        else:
            if ic_ra.at[i] is not None and not pd.isna(ic_ra.at[i]):
                event_ra.at[i] = ic_ra.at[i]
                if ic_dec.at[i] is not None and not pd.isna(ic_dec.at[i]):
                    event_dec.at[i] = ic_dec.at[i]
            if inline_isot.at[i] is not None and not pd.isna(inline_isot.at[i]):
                event_isot.at[i] = inline_isot.at[i]

    out["event_ra"] = event_ra
    out["event_dec"] = event_dec
    out["event_isot"] = event_isot
    out[DYNAMIC] = dynamic
    return out


# --- HAWC ---------------------------------------------------------------------

def x_gcn_hawc(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:521-565 (ra/dec are floats here, unlike icecube).

    Any mid-extractor exception in the reference — strptime on a matched
    date, float() on a matched-but-unparsable RA/Dec — discards the WHOLE
    dict including the subject fields, so matched-but-failed parses mask
    every output here."""
    cand = p["text"].str.contains("hawc", case=False, regex=False)
    return gated(p, cand, lambda s: _hawc_body(s))


def _hawc_body(p: pd.DataFrame) -> dict:
    ev = p["text"].str.extract(
        r"SUBJECT:.*?\b(HAWC[\- ]?[0-9]+?[A-Z]?)\b", flags=re.I, expand=False
    )
    hit = ev.notna()
    dt_g = p["text"].str.extract(
        r"On (?P<date_time>\d{2} \d{2}, \d{4}, at \d{2}:\d{2}:[\d\.]{2,}) UTC", expand=False
    )
    parsed = pd.to_datetime(
        dt_g.str.strip(), format="%m %d, %Y, at %H:%M:%S.%f", errors="coerce"
    )
    isot = _strf(parsed, "%Y-%m-%dT%H:%M:%S.%f")
    ra_raw = p["text"].str.extract(r"RA.*?: (?P<ra>[\d\.\-\+]*?) ", expand=False)
    dec_raw = p["text"].str.extract(r"Dec.*?: (?P<dec>[\d\.\-\+]*?) ", expand=False)
    ra = pd.to_numeric(ra_raw, errors="coerce")
    dec = pd.to_numeric(dec_raw, errors="coerce")
    failed = (
        (dt_g.notna() & parsed.isna())
        | (ra_raw.notna() & ra.isna())
        | (dec_raw.notna() & dec.isna())
    )
    keep = hit & ~failed
    ra_o = pd.Series([float(v) if not pd.isna(v) else None for v in ra], index=p.index, dtype=object)
    dec_o = pd.Series([float(v) if not pd.isna(v) else None for v in dec], index=p.index, dtype=object)
    return {
        "reports_hawc_event": ev.str.strip().where(keep, None).astype(object),
        "reports_event": ev.str.strip().where(keep, None).astype(object),
        "grb_isot": isot.where(keep, None),
        "event_isot": isot.where(keep, None),
        "hawc_ra": ra_o.where(keep, None),
        "event_ra": ra_o.where(keep, None),
        "hawc_dec": dec_o.where(keep, None),
        "event_dec": dec_o.where(keep, None),
    }


# --- people -------------------------------------------------------------------

def x_submitter(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:568-577."""
    g = p["text"].str.extract(r"FROM:(.*?)<(.*?)>\n", flags=re.M | re.S)
    return {
        "gcn_from_name": g[0].str.strip().astype(object),
        "gcn_from_email": g[1].str.strip().astype(object),
    }


def x_authors(p: pd.DataFrame, side: Sides) -> dict:
    """facts/gcn.py:579-589."""
    t = p["text"].str.replace("\r", "", regex=False)
    g = t.str.extract(r"FROM:.*?\n\n(.*?)\n\n", flags=re.M | re.S, expand=False)
    return {
        "gcn_authors": g.str.replace("\n", " ", regex=False).str.strip().astype(object)
    }


def x_gcn_ads_data(p: pd.DataFrame, side: Sides) -> dict:
    """adsabs.py:14-38 plugin: ADS lookup as a broadcast join keyed on the
    gcn_meta SUBJECT (INTEGRAL circulars only; missing key -> no facts)."""
    is_integral = (
        p["subject"].notna() & p["subject"].str.contains("INTEGRAL", regex=False)
    )
    if not len(side.ads):
        return {}
    m = pd.DataFrame({"subject": p["subject"].where(is_integral, None)}).merge(
        side.ads, on="subject", how="left"
    )
    m.index = p.index
    return {"gcn_authors": m["gcn_authors"].astype(object)}


GCN_BATCH_EXTRACTORS: list[ExtractorSpec] = [
    ExtractorSpec("gcn_instrument", x_gcn_instrument),
    ExtractorSpec("mentions_keyword", x_mentions_keyword),
    ExtractorSpec("mentions_named", x_mentions_named),
    ExtractorSpec("fermi_realtime", x_fermi_realtime),
    ExtractorSpec("fermi_v2", x_fermi_v2),
    ExtractorSpec("gbm_balrog", x_gbm_balrog),
    ExtractorSpec("swift_detected", x_swift_detected),
    ExtractorSpec("swift_trigger_id", x_swift_trigger_id),
    ExtractorSpec("gcn_meta", x_gcn_meta),
    ExtractorSpec("gcn_date", x_gcn_date),
    ExtractorSpec("gcn_named", x_gcn_named),
    ExtractorSpec("gcn_lvc_event", x_gcn_lvc_event),
    ExtractorSpec("gcn_integral_lvc_countepart_search", x_gcn_integral_lvc_countepart_search),
    ExtractorSpec("gcn_integral_countepart_search", x_gcn_integral_countepart_search),
    ExtractorSpec("gcn_icecube_circular", x_gcn_icecube_circular),
    ExtractorSpec("gcn_lvc_circular", x_gcn_lvc_circular),
    ExtractorSpec("integral_ul_old_variation", x_integral_ul_old_variation),
    ExtractorSpec("integral_ul", x_integral_ul),
    ExtractorSpec("clearly_detected_afterglow", x_clearly_detected_afterglow),
    ExtractorSpec("cites", x_cites),
    ExtractorSpec("afterglow", x_afterglow),
    ExtractorSpec("gcn_grb_integral_circular", x_gcn_grb_integral_circular),
    ExtractorSpec("gcn_lvc_integral_counterpart", x_gcn_lvc_integral_counterpart),
    ExtractorSpec("gcn_hawc", x_gcn_hawc),
    ExtractorSpec("submitter", x_submitter),
    ExtractorSpec("authors", x_authors),
    ExtractorSpec("gcn_ads_data", x_gcn_ads_data),
]
