"""Unit tests for the committed dryrun compile-cache seed (VERDICT r4 item 6).

``recipes/dryrun_cache/`` holds the XLA compile-cache entries a COLD
production-geometry ``dryrun_multichip(8)`` creates (captured once by
``tools_dryrun_cache.py capture`` — 430 s cold on this 1-core host);
``__graft_entry__._dryrun_multichip_impl`` seeds them into the live cache
dir before compiling so a wiped cache cannot blow the driver's timeout.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import tools_dryrun_cache as tdc  # noqa: E402


def test_tracked_entries_exist():
    names = [n for n in os.listdir(tdc.TRACKED) if n != "META.json"]
    assert names, "recipes/dryrun_cache has no captured entries"
    # the expensive program — the production-geometry sharded train step —
    # must be among them or the seed defeats its purpose
    assert any(n.startswith("jit_train_step") for n in names), names
    assert os.path.exists(os.path.join(tdc.TRACKED, "META.json"))


def test_seed_copies_missing_only(tmp_path):
    live = tmp_path / "cache"
    n1 = tdc.seed(str(live))
    tracked = [n for n in os.listdir(tdc.TRACKED) if n != "META.json"]
    assert n1 == len(tracked)
    assert sorted(os.listdir(live)) == sorted(tracked)  # META not copied

    # idempotent: nothing re-copied, existing entries untouched
    marker = live / tracked[0]
    marker.write_bytes(b"sentinel")
    assert tdc.seed(str(live)) == 0
    assert marker.read_bytes() == b"sentinel"
