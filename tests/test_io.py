"""I/O layer tests: config parsing, reference loading, native CSV/telemetry,
logging headers (reference-format parity)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_ilqr_tpu.io import logging as iolog
from mpc_ilqr_tpu.io import native
from mpc_ilqr_tpu.io.config import load_config
from mpc_ilqr_tpu.io.references import load_contact_schedule, load_reference_set
from mpc_ilqr_tpu.models.robot import load_h1

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_config_schema():
    app = load_config(os.path.join(ROOT, "config.yaml"))
    assert app.mpc.horizon == 25
    assert app.mpc.dt == 0.02
    assert app.mpc.gravity == [0.0, 0.0, -1.0]
    assert app.mpc.cost_weights["Q_position_x"] == 200.0
    assert app.mpc.cost_weights["Q_quat_xyz"] == [50.0, 50.0, 50.0]
    assert app.mpc.constraints["joint_limit_weight"] == 1500.0
    assert app.ee_feet["left_feet_ee"] == "left_ankle_link"
    assert app.engine["cost_mode"] == "reference"
    # path resolution
    assert os.path.isabs(app.resolve(app.q_ref_path))


def test_native_csv_matches_numpy():
    path = os.path.join(ROOT, "data", "q_standing.csv")
    a = native.read_csv_matrix(path)
    b = np.loadtxt(path, delimiter=",")
    np.testing.assert_array_equal(a, b)


def test_contact_schedule_loading():
    sched = load_contact_schedule(os.path.join(ROOT, "data", "contact_walking.csv"))
    assert sched.shape[1] == 2
    assert set(np.unique(sched)) <= {0.0, 1.0}
    # walking alternates: some single-stance timesteps exist
    assert np.any(sched.sum(axis=1) == 1)


def test_reference_set_tracks():
    model = load_h1(gravity=(0, 0, -1.0), timestep=0.02, dtype=jnp.float64)
    refs = load_reference_set(
        model,
        os.path.join(ROOT, "data", "q_standing.csv"),
        os.path.join(ROOT, "data", "v_standing.csv"),
        os.path.join(ROOT, "data", "contact_standing.csv"),
    )
    T = refs.length
    assert refs.x.shape == (T, model.nx)
    assert refs.ee_pos.shape == (T, 2, 3)
    # Standing: CoM nearly static and above ground, feet at ground level.
    com = np.asarray(refs.com)
    assert np.all(com[:, 2] > 0.5)
    assert np.ptp(com[:, 2]) < 0.05
    assert np.all(np.abs(np.asarray(refs.com_vel)) < 0.5)
    ee_z = np.asarray(refs.ee_pos)[:, :, 2]
    assert np.all(ee_z < 0.15)  # ankle frames sit near the ground
    # stance defaults/loading
    assert np.all(np.asarray(refs.stance) == 1.0)


def test_step_logger_header_parity(tmp_path):
    """Step-log header must match mpc.cpp:191-213 so downstream consumers of
    the reference's logs work unchanged."""
    p = tmp_path / "log.csv"
    lg = iolog.StepLogger(str(p), nx=3, nu=2)
    lg.log(1, 0.02, 5.0, 1.5, np.ones(3), np.ones(2), np.zeros(3), np.zeros(2))
    lg.close()
    lines = p.read_text().strip().splitlines()
    assert lines[0] == (
        "time_index,time_sec,solve_cost,solve_time_ms,"
        "x_0,x_1,x_2,u_0,u_1,x_ref_0,x_ref_1,x_ref_2,u_ref_0,u_ref_1"
    )
    vals = [float(v) for v in lines[1].split(",")]
    assert vals[0] == 1 and vals[2] == 5.0


def test_optimal_trajectory_logger_headers(tmp_path):
    lg = iolog.OptimalTrajectoryLogger(str(tmp_path), nq=4, nu=2)
    lg.log(1, 0.02, np.arange(4), np.arange(2))
    lg.close()
    q_lines = (tmp_path / "q_optimal.csv").read_text().strip().splitlines()
    u_lines = (tmp_path / "u_optimal.csv").read_text().strip().splitlines()
    assert q_lines[0] == "step,time_sec,q_0,q_1,q_2,q_3"
    assert u_lines[0] == "step,time_sec,u_0,u_1"


def test_async_telemetry_roundtrip(tmp_path):
    p = tmp_path / "t.csv"
    t = native.AsyncTelemetry(str(p), "a,b")
    for i in range(500):
        t.log(np.array([i, 2.0 * i]))
    t.close()
    lines = p.read_text().strip().splitlines()
    assert len(lines) == 501
    assert lines[-1] == "499,998"


def test_npz_track_loading(tmp_path):
    from mpc_ilqr_tpu.io.references import load_csv_matrix

    arr = np.arange(12.0).reshape(3, 4)
    p = tmp_path / "track.npz"
    np.savez(p, q=arr)
    np.testing.assert_array_equal(load_csv_matrix(str(p)), arr)


def test_shipped_npz_twins_match_csv():
    """data/ ships .npz twins of every reference CSV track (SURVEY C11);
    they must load identically through load_csv_matrix."""
    from mpc_ilqr_tpu.io.references import load_csv_matrix

    for name in ("q_standing", "v_standing", "q_ref2_mj", "v_ref2", "q_ref", "v_ref"):
        csv = load_csv_matrix(os.path.join(ROOT, f"data/{name}.csv"))
        npz = load_csv_matrix(os.path.join(ROOT, f"data/{name}.npz"))
        np.testing.assert_allclose(npz, csv, rtol=0, atol=0)
