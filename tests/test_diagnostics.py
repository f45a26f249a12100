"""Diagnostics heartbeat tests (reference: mono_lidar.cpp:490-507 sensor
status lifecycle + the FrequencyStatusParam sketch at :40-48)."""

import numpy as np

from limo_tpu.utils.diagnostics import (ERROR, OK, STALE, WARN,
                                        DiagnosticStatus, DiagnosticUpdater,
                                        FrequencyStatus, SensorStatusCheck)


def test_sensor_status_lifecycle():
    """STALE 'Starting...' before any frame, OK 'Valid operation' after."""
    chk = SensorStatusCheck()
    st = DiagnosticStatus(name="Sensor Status")
    chk(st)
    assert st.level == STALE and st.message == "Starting..."
    chk.heartbeat(stamp=1.5)
    chk(st)
    assert st.level == OK and st.message == "Valid operation"
    assert st.values["frames_processed"] == "1"


def test_frequency_status_bounds():
    fs = FrequencyStatus(min_freq=2.5, tolerance=0.1, window_size=5)
    st = DiagnosticStatus(name="rate")
    fs(st)
    assert st.level == STALE  # no events yet

    for t in np.arange(0, 2.0, 0.4):  # 2.5 Hz: inside bounds
        fs.tick(float(t))
    fs(st)
    assert st.level == OK, st.message

    fs2 = FrequencyStatus(min_freq=2.5, tolerance=0.1, window_size=5)
    for t in np.arange(0, 10.0, 1.0):  # 1 Hz: too slow
        fs2.tick(float(t))
    st2 = DiagnosticStatus(name="rate")
    fs2(st2)
    assert st2.level == WARN and "too low" in st2.message

    fs3 = FrequencyStatus(min_freq=2.5, max_freq=2.5, tolerance=0.1)
    for t in np.arange(0, 1.0, 0.1):  # 10 Hz: too fast
        fs3.tick(float(t))
    st3 = DiagnosticStatus(name="rate")
    fs3(st3)
    assert st3.level == WARN and "too high" in st3.message


def test_updater_throttle_and_error_isolation():
    clock = {"t": 0.0}
    upd = DiagnosticUpdater(hardware_id="hw0", period=1.0,
                            clock=lambda: clock["t"])
    upd.add("ok_check", lambda s: s.summary(OK, "fine"))

    def bad_check(s):
        raise RuntimeError("boom")

    upd.add("bad_check", bad_check)

    out = upd.force_update()
    assert [s.level for s in out] == [OK, ERROR]
    assert out[0].hardware_id == "hw0"
    assert "boom" in out[1].message

    clock["t"] = 0.5
    assert upd.update() is None          # throttled
    clock["t"] = 1.6
    assert upd.update() is not None      # period elapsed
    assert len(upd.history) == 2


def test_pipeline_emits_heartbeat():
    """The odometry driver flips its sensor status to OK after one frame."""
    import jax.numpy as jnp
    from limo_tpu.config import CapacityConfig, LimoConfig
    from limo_tpu.geometry.camera import CameraRig
    from limo_tpu.pipeline.odometry import MonoOdometry
    from limo_tpu.pipeline.tracklets import Tracklets

    cfg = LimoConfig(capacity=CapacityConfig(max_keyframes=5,
                                             max_landmarks=64,
                                             max_cameras=1))
    rig = CameraRig.single(500.0, 320.0, 240.0, dtype=jnp.float32)
    odo = MonoOdometry(rig, cfg)
    assert odo.diagnostics.last_statuses[0].level == STALE

    tr = Tracklets.empty(window=1)
    tr.stamps = np.array([0.0])
    odo.process_frame(0.0, tr)
    odo.diagnostics.force_update()
    st = odo.diagnostics.last_statuses[0]
    assert st.level == OK and st.message == "Valid operation"
