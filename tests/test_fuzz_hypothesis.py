"""Adversarial parity fuzzing: hypothesis-composed documents, vectorized
extraction vs the row-at-a-time shim.

The seeded corpus exercises the happy paths; this suite composes documents
from mutated fragments (broken headers, near-miss sentences, stray \\r,
weird whitespace, multiple SUBJECT lines) to hit the mask/drop interactions
— the places where a vectorized re-expression most plausibly diverges from
the reference's per-doc control flow.
"""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from literature_to_facts_spark.engine import pipeline as pl
from literature_to_facts_spark.shim import reference_shim as rs

import os

_FUZZ_SCALE = int(os.environ.get("L2F_FUZZ_SCALE", "1"))

SIDES_V = pl.make_sides()
SIDES_S = rs.SideTables()

HEADER_LINES = [
    "TITLE:   GCN CIRCULAR",
    "NUMBER:  31373",
    "NUMBER:  31373A",          # non-integer -> identity failure
    "NUMBER: +31374",
    "NUMBER:",
    "SUBJECT: GRB 220101A: Fermi GBM detection",
    "SUBJECT: GRB 220101A: INTEGRAL observations",
    "SUBJECT: LIGO/Virgo S211123a: Identification of a GW merger",
    "SUBJECT: LIGO/Virgo S211123a: INTEGRAL ACS counterpart search",
    "SUBJECT: IceCube-211125A - IceCube observation of a neutrino candidate",
    "SUBJECT: HAWC-211123A: detection",
    "SUBJECT: Swift detection of GRB 211207A",
    "subject: lowercase subject GRB 220101A: test",
    "DATE:    21/11/25 07:21:14 GMT",
    "DATE:    99/99/99 07:21:14 GMT",  # strptime failure path
    "DATE: garbage",
    "FROM:    Ann Observer at Obs  <ann@example.org>",
    "FROM: broken no email",
]

BODY_LINES = [
    "At 17:33:54 UT on 20 Oct 2020, the Fermi Gamma-ray Burst Monitor (GBM) triggered",
    "At 99:99:99 UT on 20 Oct 2020, the Fermi Gamma-ray Burst Monitor (GBM) triggered",
    "The on-ground calculated location, using the Fermi GBM trigger data, is RA = 1.2, Dec = -3.4 (J2000), with a statistical uncertainty of 5.0 degrees.",
    "At 13:57:18.60 UT on 1 August 2021, the Fermi Gamma-Ray Burst Monitor (GBM) triggered and located GRB 210801A",
    "At 11:41:34 UT, the Swift Burst Alert Telescope (BAT) triggered and located GRB 200522A (trigger=973628).",
    "At 11:41:34 UT, the Swift Burst Alert Telescope (BAT) triggered and located X",
    "On 2021/11/16 at 10:33:16.05 UT IceCube detected a track-like event",
    "On 2021-11-16 at 10:33:16 UT IceCube detected",  # no .%f -> strptime fail
    "RA: 42.45 (J2000)",
    "Dec: 0.15 (J2000)",
    "RA: +-..3 (garbage coords)",
    "On 11 23, 2021, at 03:52:23.50 UTC, HAWC detected",
    "SUBJECT: HAWC-211123A: detection",
    "RA(J2000): 1.2.3 (unparsable floats, reference drop-all)",
    "Dec(J2000): -.-. (worse)",
    "On 99 99, 2021, at 99:99:99.99 UTC, HAWC detected",
    "upper limit on the 75-2000 keV fluence of 4.6x10^-7 erg/cm^2",
    "upper limit of about 1.2e-7 erg/cm^2 for a 1 s duration",
    "We find a limiting fluence of 2.3e-7 erg/cm",
    "upper limit on the 75-2000 keV fluence of x10^ erg/cm",  # float() failure
    "occurred at 2019-11-09 01:07:17.22 UTC, hereafter T0.",
    "at 2021-11-23 12:34:56.789 UTC during processing",
    "the afterglow was clearly detected",
    "see GCN Circ. 31347, GCN circ 31350, GCNC 31351 and GCN 31354; ATel #15099",
    # the '.' in the 'gcn circ.' prefix is a regex ANY-CHAR: tab/x after
    # 'Circ' still matches (caught a gating parity break in round 2)
    "see GCN Circ\t67890 and GCN CircX31999 reported",
    "atel#123 gcn  456 gcn circ  789",
    "IceCube-211125A and IC211125A and FRB20211122A and PKS 0903-57",
    "AT2022cmc ZTF22aaajecb Mrk 421 GRB 220211A",
    "IceCube IceCube HAWC INTEGRAL SPI-ACS blazarGW170817 GW190425",
    "triggered at 19:55:53 UT on the satellite",
    "https://grb.mpe.mpg.de/grb/GRB210812699/json is the localization",
    "https://gcn.gsfc.nasa.gov/notices_amon_g_b/136015_21306805.amon",
    "random filler sentence with no astro content at all",
    "mentions appears literally in this sentence",
    "",
]

line_strategy = st.one_of(
    st.sampled_from(HEADER_LINES),
    st.sampled_from(BODY_LINES),
    st.text(alphabet=" aZ0.:#\t", max_size=20),
)


def _shim_triples(kind: str, text: str) -> set:
    try:
        doc = rs.decode_doc(kind, text)
        _, triples = rs.extract_doc_facts(kind, doc, SIDES_S)
    except Exception:
        return set()
    return {
        (s.strip("<>"), p.strip("<>").split("#")[-1], o) for s, p, o in triples
    }


def _vec_triples(kind: str, texts: list[str]) -> set:
    docs = pd.DataFrame(
        {
            "url": [f"https://gcn.gsfc.nasa.gov/gcn3/{i}.gcn3" for i in range(len(texts))]
            if kind == "gcn"
            else [f"https://www.astronomerstelegram.org/?read={i}" for i in range(len(texts))],
            "text": texts,
            "kind": [kind] * len(texts),
        }
    )
    out = pl.extract_batch(docs, SIDES_V)
    return set(zip(out["subj"], out["pred"], out["obj_n3"]))


@given(st.lists(st.lists(line_strategy, min_size=1, max_size=25), min_size=1, max_size=6))
@settings(max_examples=120 * _FUZZ_SCALE, deadline=None)
def test_gcn_fuzz_parity(doc_line_lists):
    texts = ["\n".join(lines) + "\n" for lines in doc_line_lists]
    golden = set()
    for t in texts:
        golden |= _shim_triples("gcn", t)
    got = _vec_triples("gcn", texts)
    assert got == golden, (sorted(got - golden)[:4], sorted(golden - got)[:4])


ATEL_FIELDS = st.fixed_dictionaries(
    {
        "atelid": st.integers(10000, 20000),
        "title": st.sampled_from(
            [
                "FRB 20211122A: repeating bursts",
                "PKS 0735+17 optical activity (see ATel #15099)",
                "IceCube-211208A follow-up GRB",
                "plain title with nothing",
            ]
        ),
        "date": st.sampled_from(
            ["8 Dec 2021; 23:20 UT", "31 Feb 2021; 10:00 UT", "not a date"]
        ),
        "tags": st.sampled_from(
            ["AGN, Blazar", "Optical", "Gamma Ray, Request for Observations", ""]
        ),
        "body": st.lists(st.sampled_from(BODY_LINES), min_size=1, max_size=6),
    }
)


ARXIV_FIELDS = st.fixed_dictionaries(
    {
        "aid": st.integers(1, 99999),
        "title": st.sampled_from(
            ["GRB jets and GW170817", "magnetar SGR flares", "nothing notable", "FRB GRB FRB"]
        ),
        "summary": st.sampled_from(
            ["GRB GRB models with INTEGRAL data", "SGR and GW190425", "plain summary"]
        ),
        "updated": st.sampled_from(
            ["2022-01-05T10:00:00Z", "2021-13-45T99:00:00Z", "garbage",
             "2022-01-05T10:00:00+02:00", "2022-01-05 10:00:00"]
        ),
    }
)


@given(st.lists(ARXIV_FIELDS, min_size=1, max_size=4))
@settings(max_examples=60 * _FUZZ_SCALE, deadline=None)
def test_arxiv_fuzz_parity(entries):
    from literature_to_facts_spark.sources.corpus import arxiv_text

    texts = [
        arxiv_text(f"2201.{e['aid']:05d}v1", e["title"], e["summary"], e["updated"])
        for e in entries
    ]
    docs = pd.DataFrame(
        {
            "url": [f"http://arxiv.org/abs/2201.{e['aid']:05d}v1" for e in entries],
            "text": texts,
            "kind": ["arxiv"] * len(texts),
        }
    )
    golden = set()
    for t in texts:
        golden |= _shim_triples("arxiv", t)
    out = pl.extract_batch(docs, SIDES_V)
    got = set(zip(out["subj"], out["pred"], out["obj_n3"]))
    assert got == golden, (sorted(got - golden)[:4], sorted(golden - got)[:4])


@given(st.lists(ATEL_FIELDS, min_size=1, max_size=4))
@settings(max_examples=60 * _FUZZ_SCALE, deadline=None)
def test_atel_fuzz_parity(entries):
    from literature_to_facts_spark.sources.corpus import atel_text

    texts = [
        atel_text(
            e["atelid"], e["title"], "A. B.; C. D.", "q@example.org",
            e["date"], e["tags"], " ".join(e["body"]),
        )
        for e in entries
    ]
    golden = set()
    for t in texts:
        golden |= _shim_triples("atel", t)
    got = _vec_triples("atel", texts)
    assert got == golden, (sorted(got - golden)[:4], sorted(golden - got)[:4])
