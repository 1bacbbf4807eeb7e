"""bench.discover_big_base: the driver's end-of-round bench must pick up
whatever sharded-builder bundle actually exists on disk (machine resets have
wiped bench_data/ mid-build three rounds running, leaving varying scales),
largest N first, and ignore incomplete bundles (graph stage done but GT
missing, or vice versa)."""

import os

import bench


def _touch(d, name):
    p = os.path.join(d, name)
    with open(p, "w") as f:
        f.write("x")
    return p


def test_discovery_orders_and_filters(tmp_path):
    d = str(tmp_path)
    # complete 40M R=64 bundle
    _touch(d, "synthg_v1_n40000000_d128_r64_m32_shardvamana_disk.bin")
    _touch(d, "synthg_v1_n40000000_d128_r64_m32_shardvamana_gt.bin")
    # complete, larger but lower-degree 100M R=32 bundle
    _touch(d, "synthg_v1_n100000000_d128_r32_m32_shardvamana_disk.bin")
    _touch(d, "synthg_v1_n100000000_d128_r32_m32_shardvamana_gt.bin")
    # incomplete: _disk.bin without ground truth -> skipped
    _touch(d, "synthg_v1_n200000000_d128_r64_m32_shardvamana_disk.bin")
    # non-sharded bundle name -> not matched by the glob
    _touch(d, "synth_v2_n1000000_d128_r64_m64_vamana_disk.bin")
    _touch(d, "synth_v2_n1000000_d128_r64_m64_vamana_gt.bin")

    cands = bench.discover_big_base(d)
    assert [(n, r) for n, r, _ in cands] == [(100_000_000, 32), (40_000_000, 64)]
    assert cands[0][2].endswith("synthg_v1_n100000000_d128_r32_m32_shardvamana")


def test_discovery_r_tiebreak(tmp_path):
    d = str(tmp_path)
    for r in (32, 64):
        _touch(d, f"synthg_v1_n40000000_d128_r{r}_m32_shardvamana_disk.bin")
        _touch(d, f"synthg_v1_n40000000_d128_r{r}_m32_shardvamana_gt.bin")
    cands = bench.discover_big_base(d)
    # same N: the R=64 DiskANN-quality graph wins
    assert cands[0][1] == 64


def test_discovery_empty(tmp_path):
    assert bench.discover_big_base(str(tmp_path)) == []
