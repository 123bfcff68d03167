"""Golden-value tests mirroring the reference's own suite
(/root/reference/tests/test_gcn.py) against the shim oracle on the synthetic
golden documents.  These pin the semantics that the Spark pipeline is then
held to (tests/test_spark_parity.py)."""

import pytest

from literature_to_facts_spark.shim import reference_shim as rs
from literature_to_facts_spark.sources import corpus as cp


@pytest.fixture(scope="module")
def side():
    return rs.SideTables(
        balrog={r["url_json"]: r for _, r in cp.GOLDEN_BALROG.iterrows()},
        amon_notices={r["url"]: r["notice_text"] for _, r in cp.GOLDEN_AMON.iterrows()},
        ads_authors={r["subject"]: r["gcn_authors"] for _, r in cp.GOLDEN_ADS.iterrows()},
    )


def parse_gcn(i, side):
    _, triples = rs.extract_doc_facts("gcn", cp.GOLDEN_GCNS[i], side)
    return rs.dict_view_of_facts(triples)


def parse_atel(i, side):
    entry = rs.parse_atel_email_text(cp.GOLDEN_ATELS[i])
    _, triples = rs.extract_doc_facts("atel", entry, side)
    return rs.dict_view_of_facts(triples)


def test_iul(side):  # ref tests/test_gcn.py:55-58
    G = parse_gcn(20249, side)
    assert float(G["paper:integral_ul"]) == 4.6e-7


def test_fermirt(side):  # ref :61-64
    assert parse_gcn(28702, side)["paper:grb_isot"] == "2020-10-20T17:33:54"


def test_swift(side):  # ref :67-74
    assert parse_gcn(28666, side)["paper:grb_isot"] == "2020-10-17T09:46:31"
    assert parse_gcn(31182, side)["paper:swift_trigger_id"] == 1088376


def test_swift_count24_quirk(side):  # facts/gcn.py:181 count=24
    G = parse_gcn(27771, side)
    assert G["paper:grb_isot"] == "2020-05-22T11:41:34"
    G = parse_gcn(27772, side)
    assert "paper:grb_isot" not in G  # sentence after the 24th newline
    assert G["paper:swift_trigger_id"] == 973629  # trigger regex still fires


def test_gbm_v2(side):  # ref :79-82
    assert parse_gcn(30585, side)["paper:grb_isot"] == "2021-08-01T13:57:18.600000"


def test_gbm_coord(side):  # ref :85-91
    G = parse_gcn(31077, side)
    assert G["paper:grb_isot"] == "2021-11-12T14:34:22"
    assert "%.5lg" % float(G["paper:gbm_ra"]) == "138.4"
    assert "%.5lg" % float(G["paper:gbm_dec"]) == "-2.5"
    assert "%.5lg" % float(G["paper:gbm_rad"]) == "3"


def test_gbm_balrog(side):  # ref :94-99
    G = parse_gcn(30634, side)
    assert G["paper:grb_isot"] == "2021-08-12T16:47:01.010000"
    assert G["paper:gbm_trigger_id"] == 650479626
    assert G["paper:url"] == "https://grb.mpe.mpg.de/grb/GRB210812699/"


def test_icecube(side):  # ref :102-130
    G = parse_gcn(31126, side)
    assert G["paper:reports_icecube_event"] == "IceCube-211125A"
    assert G["paper:event_isot"] == "2021-11-25T06:22:21.550000"
    assert float(G["paper:event_ra"]) == 43.59
    assert float(G["paper:event_dec"]) == 22.5899

    G = parse_gcn(31085, side)
    assert G["paper:reports_icecube_event"] == "IceCube-211116A"
    assert G["paper:event_isot"] == "2021-11-16T10:33:16.050000"
    assert float(G["paper:event_ra"]) == 42.45
    assert float(G["paper:event_dec"]) == 0.15

    G = parse_gcn(30957, side)
    assert G["paper:reports_icecube_event"] == "IceCube-211023A"
    assert G["paper:event_isot"] == "2021-10-23T08:31:18.310000"
    assert float(G["paper:event_ra"]) == 253.3
    assert float(G["paper:event_dec"]) == -1.7199

    G = parse_gcn(31110, side)
    assert G["paper:reports_icecube_event"] == "IceCube-211123A"
    assert G["paper:event_isot"] == "2021-11-23T14:25:22.600000"
    assert float(G["paper:event_ra"]) == 265.5199
    assert float(G["paper:event_dec"]) == 7.33


def test_icecube_follow_up(side):  # ref :133-136
    assert parse_gcn(31120, side)["paper:mentions_named_event"] == ["IceCube-211123A"]


def test_hawc(side):  # ref :168-174
    G = parse_gcn(31106, side)
    assert G["paper:grb_isot"] == "2021-11-23T03:52:23.500000"
    assert G["paper:mentions_named_hawc"] == ["HAWC-211123A"]
    assert G["paper:hawc_ra"] == 34.12
    assert G["paper:hawc_dec"] == -8.05


def test_afterglow(side):  # ref :177-187
    G = parse_gcn(31373, side)
    assert G["paper:mentions_named_grb"] == ["GRB220101A"]
    assert G["paper:reports_characteristic"] == ["http://odahub.io/ontology/afterglow"]
    assert G["paper:cites"] == [
        "http://odahub.io/ontology/paper#gcn31347",
        "http://odahub.io/ontology/paper#gcn31350",
        "http://odahub.io/ontology/paper#gcn31351",
        "http://odahub.io/ontology/paper#gcn31354",
        "http://odahub.io/ontology/paper#gcn31360",
        "http://odahub.io/ontology/paper#gcn31372",
    ]


def test_many_named(side):  # ref :190-193
    G = parse_gcn(31132, side)
    assert G["paper:mentions_named_event"] == ["IC211125A", "IceCube-211125A"]


def test_gcnc_citations(side):  # ref :196-199
    assert parse_gcn(31901, side)["paper:cites"] == [
        f"http://odahub.io/ontology/paper#gcn{i}"
        for i in (31880, 31881, 31882, 31885, 31887, 31891, 31898)
    ]


def test_atel_long_frb_name(side):  # ref :147-150
    assert parse_atel(15055, side)["paper:mentions_named_event"] == ["FRB20211122A"]


def test_atel_pks(side):  # ref :153-156
    assert parse_atel(15058, side)["paper:mentions_named_event"] == ["PKS0903-57"]


def test_atel_2sources(side):  # ref :202-213
    G = parse_atel(15100, side)
    assert G["paper:mentions_named_event"] == [
        "IceCube-170922A", "IceCube-211208A", "IceCube-2112108A", "PKS0735+17",
    ]
    assert G["paper:topics"] == [
        "agn", "blazar", "neutrinos", "optical", "request for observations",
    ]
    assert G["paper:cites_atel_id"] == "15099"
    assert G["paper:cites_gcn_id"] == "31191"
    assert G["paper:cites"] == [
        "http://odahub.io/ontology/paper#atel15098",
        "http://odahub.io/ontology/paper#atel15099",
        "http://odahub.io/ontology/paper#gcn31191",
    ]


def test_keyword_bugs(side):  # facts/common.py:17-18,77 preserved
    G = parse_gcn(29999, side)
    assert G["paper:mentions_blazargw170817"] == "body"  # concatenated token
    assert "paper:mentions_blazar" not in G
    assert "paper:mentions_gw170817" not in G
    assert G["paper:mentions_gw190425"] == "body"
    assert G["paper:mentions_icecube_times"] == 3
    assert G["paper:mentions_hawc_times"] == 2


def test_lvc_counterpart_family(side):
    G = parse_gcn(26221, side)
    assert G["paper:lvc_event_report"] == "LIGO/Virgo S191109d"
    assert G["paper:lvc_event_utc"] == "2019-11-09 01:07:17.221"

    G = parse_gcn(26222, side)
    assert G["paper:original_event"] == ["LIGO/Virgo S191109d"]
    assert G["paper:original_event_utc"] == ["2019-11-09 01:07:17.22"]
    assert G["paper:instrument"] == ["acs", "ibis"]
    assert G["paper:lvc_counterpart_by"] == "INTEGRAL"
    assert float(G["paper:integral_ul"]) == 2.3e-7
    # gcn_authors: authors block + ADS broadcast side lookup
    assert "C. Ferrigno; V. Savchenko; INTEGRAL multimessenger team" in G["paper:gcn_authors"]


def test_integral_ul_variations(side):  # facts/gcn.py:429-462 all 4+1 paths
    assert float(parse_gcn(25001, side)["paper:integral_ul"]) == 1.2e-7
    assert float(parse_gcn(25002, side)["paper:integral_ul"]) == 3.1e-7
    assert float(parse_gcn(25003, side)["paper:integral_ul"]) == 5.0e-7
    assert parse_gcn(25001, side)["paper:event_t0"] == "2019-08-29 19:55:53"


def test_arxiv(side):
    entry = rs.parse_arxiv_json_text(cp.GOLDEN_ARXIV["2201.01234v1"])
    _, triples = rs.extract_doc_facts("arxiv", entry, side)
    G = rs.dict_view_of_facts(triples)
    assert G["paper:mentions_grb"] == "summary"
    assert G["paper:mentions_grb_times"] == 3
    assert G["paper:mentions_gw170817"] == "summary"
    assert G["paper:updated_isot"] == "2022-01-05T10:00:00Z"
    assert G["paper:timestamp"] == 1641376800.0
    assert G["paper:location"] == "http://arxiv.org/abs/2201.01234v1"


def test_valuable_filter_drops_boring(side):
    boring = cp.gcn_text(
        40001, "Conference announcement", "21/01/01 00:00:00 GMT",
        "Nothing interesting here at all.",
    )
    cid, triples = rs.extract_doc_facts("gcn", boring, side)
    assert cid == "gcn40001"
    assert triples == []


def test_identity_failure_raises(side):
    import pytest as _pytest

    with _pytest.raises(rs.IdentityError):
        rs.extract_doc_facts("gcn", "SUBJECT: no number header\n", side)


def test_corpus_text_invariant():
    docs = cp.build_corpus(n_docs=200, seed=42).documents
    for _, row in docs.iterrows():
        assert row["text"] == row["html"].decode("ascii", "replace")
    # at least one doc actually exercises the replacement character
    assert any("�" in t for t in docs["text"])


def test_ads_strictness_ambiguous_response():
    """adsabs.py:31 ``assert len(docs) == 1``: an ADS answer with two docs
    for the SUBJECT yields NO gcn_authors fact (the reference raises inside
    the workflow); exactly one doc yields it.  Covers shim and the Spark
    side-table prep."""
    import pandas as pd

    from literature_to_facts_spark.extractors.gcn import prepare_ads_side

    subj = "GRB 220101A: INTEGRAL SPI-ACS observation of a burst"
    text = cp.gcn_text(
        77001, subj, "Sat, 01 Jan 22 12:00:00 GMT",
        "INTEGRAL mentions GRB 220101A in this burst report.",
    )

    # shim: one doc -> fact; two docs -> assert -> extractor swallowed
    side_one = rs.SideTables(ads_authors={subj: ["X. One; Y. Two"]})
    side_two = rs.SideTables(ads_authors={subj: ["X. One", "Z. Other"]})
    _, t1 = rs.extract_doc_facts("gcn", text, side_one)
    _, t2 = rs.extract_doc_facts("gcn", text, side_two)
    # the header `authors` extractor also emits gcn_authors, so assert on the
    # ADS-injected VALUES specifically
    assert any("X. One; Y. Two" in o for _s, _p, o in t1)
    assert not any(("X. One" in o or "Z. Other" in o) for _s, _p, o in t2)

    # Spark side-table prep: ambiguous subjects are filtered out up front
    raw = pd.DataFrame(
        [
            {"subject": subj, "gcn_authors": "X. One"},
            {"subject": subj, "gcn_authors": "Z. Other"},
            {"subject": "other INTEGRAL subject", "gcn_authors": "U. Unique"},
        ]
    )
    prepped = prepare_ads_side(raw)
    assert list(prepped["subject"]) == ["other INTEGRAL subject"]


def test_cites_dotted_prefix_anychar():
    """The '.' in the 'gcn circ.' cite prefix is a regex ANY-CHAR
    (contractual reference bug): 'GCN Circ\\t67890' must still match, and
    'GCN Circ 12345' matches BOTH the dotted and undotted prefix, appending
    the URI twice — which flips the dict view's scalar-vs-list decision.
    Vectorized batch must agree with the shim on all of it."""
    import pandas as pd

    from literature_to_facts_spark.extractors.common import cites_batch

    texts = ["see GCN Circ\t67890 reports", "see GCN Circ 12345 end", "no cites"]
    idx = pd.RangeIndex(3)
    out = cites_batch(pd.Series([""] * 3, index=idx), pd.Series(texts, index=idx))
    assert out["cites_gcn_id"][0] == "67890"  # tab matched by the any-char
    assert out["cites_gcn_id"][1] == "12345"
    assert len(out["cites"][1]) == 2  # dotted + undotted prefix both matched
    assert out["cites"][2] == []
    for i, t in enumerate(texts):
        shim = rs.cites_common("", t)
        assert out["cites"][i] == shim.get("cites", [])
        assert out["cites_gcn_id"][i] == shim.get("cites_gcn_id")
