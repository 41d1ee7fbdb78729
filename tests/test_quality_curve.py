"""quality_curve.py snapshot discovery, ordering, and step filtering."""
import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "quality_curve", os.path.join(REPO, "scripts", "quality_curve.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_snapshot_discovery_and_filter(tmp_path, monkeypatch, capsys):
    qc = _load()
    ck = tmp_path / "ckpts" / "run1"
    ck.mkdir(parents=True)
    for name in (
        "train_state_step200.msgpack",
        "train_state_step1000.msgpack",
        "train_state.msgpack",
    ):
        (ck / name).write_bytes(b"x")

    calls = []

    def fake_eval(argv):
        calls.append(argv)
        return 12.5, 0.7

    import pixelnerf_tpu.apps.eval_approx as ea

    monkeypatch.setattr(ea, "main", fake_eval)

    curve = qc.main(
        ["-n", "run1", "--checkpoints_path", str(tmp_path / "ckpts"),
         "--split", "test"]
    )
    # ordered: numbered snapshots ascending, live checkpoint last
    assert [p["step"] for p in curve] == [200, 1000, None]
    assert all(p["psnr"] == 12.5 and p["ssim"] == 0.7 for p in curve)
    # passthrough flags reach the evaluator
    assert all("--split" in argv for argv in calls)
    # one JSON line per point was printed
    out = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(out) == 3 and json.loads(out[0])["step"] == 200

    calls.clear()
    curve = qc.main(
        ["-n", "run1", "--checkpoints_path", str(tmp_path / "ckpts"),
         "--steps", "1000"]
    )
    assert [p["step"] for p in curve] == [1000]  # live excluded under filter

def test_snapshot_watcher_step_tagging(tmp_path):
    """snapshot_watcher copies the live file to a step-tagged name only when
    the trained step advanced by the snapshot stride."""
    import flax.serialization

    spec = importlib.util.spec_from_file_location(
        "snapshot_watcher", os.path.join(REPO, "scripts", "snapshot_watcher.py")
    )
    sw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sw)

    live = tmp_path / "train_state.msgpack"

    def write_live(step):
        live.write_bytes(
            flax.serialization.msgpack_serialize({"step": step, "params": {}})
        )

    write_live(100)
    assert sw.read_step(str(live)) == 100
    last = sw.snapshot_if_due(str(live), last_snap=-2000, every=2000)
    assert last == 100
    assert (tmp_path / "train_state_step100.msgpack").exists()

    write_live(1900)  # +1800 < stride: no snapshot
    assert sw.snapshot_if_due(str(live), last_snap=last, every=2000) == 100
    assert not (tmp_path / "train_state_step1900.msgpack").exists()

    write_live(2200)  # +2100 >= stride: snapshot, and it round-trips
    assert sw.snapshot_if_due(str(live), last_snap=last, every=2000) == 2200
    snap = tmp_path / "train_state_step2200.msgpack"
    assert snap.exists() and sw.read_step(str(snap)) == 2200
