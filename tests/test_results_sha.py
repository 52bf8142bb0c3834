"""Spot-check RESULTS_SHA.json: re-run a sample of cheap queries at
sf0.01 and verify their canonical md5 matches the published value, so
any silent output change diffs in review (VERDICT r3 item 7)."""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHA_PATH = os.path.join(REPO, "RESULTS_SHA.json")
SF = "/root/testdata/sf0.01"

# ten cheap, shape-diverse queries (relational, window, text, dedup,
# geo, sketch families)
SPOT = ["pricing_summary", "top_customers", "events_hourly",
        "events_asof", "props_extract", "hdr_quantiles", "exact_dedup",
        "minhash_bands", "tile_counts", "char_trigrams"]


@pytest.mark.usefixtures("ray_session")
def test_spot_hashes_match_published():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    sys.path.insert(0, REPO)
    from check_correctness import to_pandas
    from publish_hashes import canonical_md5

    import __ray_entry__ as entrymod
    with open(SHA_PATH) as f:
        published = json.load(f)["queries"]
    qs = entrymod.queries()
    missing = [n for n in SPOT if n not in published]
    assert not missing, f"not in RESULTS_SHA.json: {missing}"
    for name in SPOT:
        df = to_pandas(qs[name](SF))
        got = canonical_md5(df)
        want = published[name]
        assert "md5" in want, f"{name} published with error: {want}"
        assert got == want["md5"], \
            f"{name}: canonical md5 drifted ({got} vs {want['md5']})"
        assert len(df) == want["rows"]


def test_published_file_covers_all_queries():
    sys.path.insert(0, REPO)
    import __ray_entry__ as entrymod
    with open(SHA_PATH) as f:
        published = json.load(f)["queries"]
    names = set(entrymod.queries())
    missing = names - set(published)
    assert not missing, f"queries missing from RESULTS_SHA.json: {missing}"
    errored = [n for n, v in published.items() if "md5" not in v]
    assert not errored, f"queries published with errors: {errored}"
