"""Multi-host metric aggregation: tally round-trip vs accumulate, and the
device psum collective on the virtual 8-device mesh
(reference mot_evaluator.py:244-248 gather/reduce)."""

import numpy as np

from busca_tpu.eval import metrics as metrics_lib
from busca_tpu.eval.runner import (
    global_metrics,
    metrics_to_tally,
    psum_tallies,
    shard_sequences,
    tally_to_metrics,
)


def _mk(num_gt, fp, fn, idsw, matches, motp, idr, idp, mt=1, ml=0):
    idf1 = 0.0  # recomputed by aggregation; per-seq value unused here
    return metrics_lib.MotMetrics(
        mota=1.0 - (fp + fn + idsw) / num_gt,
        motp=motp,
        idf1=idf1,
        idp=idp,
        idr=idr,
        num_switches=idsw,
        num_false_positives=fp,
        num_misses=fn,
        num_matches=matches,
        num_gt=num_gt,
        mostly_tracked=mt,
        mostly_lost=ml,
    )


PER_SEQ = {
    "a": _mk(100, 5, 10, 2, 90, 0.85, idr=0.8, idp=0.9),
    "b": _mk(250, 20, 30, 5, 220, 0.9, idr=0.75, idp=0.85, mt=2, ml=1),
    "c": _mk(40, 1, 2, 0, 38, 0.95, idr=0.9, idp=0.95),
}


def test_tally_roundtrip_matches_accumulate():
    want = metrics_lib.accumulate(PER_SEQ)
    tally = sum(metrics_to_tally(m) for m in PER_SEQ.values())
    got = tally_to_metrics(tally)
    for f in ("mota", "motp", "idf1", "num_gt", "num_false_positives",
              "num_misses", "num_switches", "mostly_tracked", "mostly_lost"):
        np.testing.assert_allclose(
            getattr(got, f), getattr(want, f), rtol=1e-9,
            err_msg=f,
        )


def test_global_metrics_single_process():
    got = global_metrics(PER_SEQ)
    want = metrics_lib.accumulate(PER_SEQ)
    np.testing.assert_allclose(got.mota, want.mota)
    np.testing.assert_allclose(got.idf1, want.idf1)


def test_psum_tallies_on_virtual_mesh():
    """8 simulated hosts' tallies reduced by the XLA collective == numpy sum
    (float32 collective; counts are exactly representable)."""
    from busca_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, tp_size=1)
    rng = np.random.RandomState(0)
    tallies = rng.randint(0, 1000, (8, 10)).astype(np.float64)
    got = psum_tallies(tallies, mesh, axis="dp")
    np.testing.assert_allclose(got, tallies.sum(0))


def test_shard_then_gather_is_complete():
    """shard_sequences partitions without overlap or loss, so the summed
    tallies cover every sequence exactly once."""
    names = list(PER_SEQ)
    shards = [shard_sequences(names, i, 3) for i in range(3)]
    flat = [n for s in shards for n in s]
    assert sorted(flat) == sorted(names)
    tally = np.zeros(10)
    for s in shards:  # simulate per-host local reduction
        for n in s:
            tally += metrics_to_tally(PER_SEQ[n])
    got = tally_to_metrics(tally)
    want = metrics_lib.accumulate(PER_SEQ)
    np.testing.assert_allclose(got.mota, want.mota)
    np.testing.assert_allclose(got.idf1, want.idf1)


def test_idfp_only_shard_counts_in_denominator():
    """A shard with predictions but zero IDTP (idp == 0) must still
    contribute its prediction count to the global IDF1/IDP denominator;
    the idtp/idp reconstruction collapses to 0 there, inflating IDF1."""
    good = _mk(num_gt=100, fp=0, fn=0, idsw=0, matches=100, motp=0.1,
               idr=1.0, idp=1.0)
    good.num_pred = 100
    junk = _mk(num_gt=50, fp=80, fn=50, idsw=0, matches=0, motp=0.0,
               idr=0.0, idp=0.0)
    junk.num_pred = 80  # eighty garbage predictions, zero identity TPs

    agg = metrics_lib.accumulate({"a": good, "b": junk})
    # idtp = 100; num_gt = 150; total_p = 180
    assert abs(agg.idf1 - 2 * 100 / (150 + 180)) < 1e-9
    assert abs(agg.idp - 100 / 180) < 1e-9

    from busca_tpu.eval.runner import metrics_to_tally, tally_to_metrics

    t = metrics_to_tally(good) + metrics_to_tally(junk)
    via_tally = tally_to_metrics(t)
    assert abs(via_tally.idf1 - agg.idf1) < 1e-9
    assert abs(via_tally.idp - agg.idp) < 1e-9
