"""cfg.Profile observability mode: the phase-split plane step must be
numerically identical to the fused step, and timing.0 must carry the
reference-style per-phase columns (profile.c + raytrace.c:54-64)."""
import numpy as np

from calclens_tpu.config import RayTraceConfig
from calclens_tpu.driver import Raytracer
from calclens_tpu.testing import pointmass as pm


def _cfg(tmp, profile):
    return RayTraceConfig(
        OmegaM=0.3,
        maxComvDistance=2000.0,
        NumLensPlanes=4,
        LensPlanePath=str(tmp),
        LensPlaneName="pmplane",
        OutputPath=str(tmp),
        SHTOrder=5,
        rayOrder=4,
        bundleOrder=2,
        partMass=5.0e16,
        raPointMass=32.0,
        decPointMass=14.0,
        radPointMass=625.0,
        PointMassTest=True,
        Profile=profile,
    ).finalize()


def test_profiled_step_matches_fused(tmp_path):
    cfg_f = _cfg(tmp_path, False)
    pm.make_pointmass_planes(cfg_f, snap_to_pixel_order=cfg_f.SHTOrder)

    rt_f = Raytracer(cfg_f)
    rt_f.init_rays()
    for p in range(cfg_f.NumLensPlanes):
        rt_f.step(p)

    cfg_p = _cfg(tmp_path, True)
    rt_p = Raytracer(cfg_p)
    rt_p.init_rays()
    for p in range(cfg_p.NumLensPlanes):
        rt_p.step(p)

    a = np.asarray(rt_f.rays_packed)
    b = np.asarray(rt_p.rays_packed)
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-7)

    # phase rows were collected for the planes with particles
    tags = {t for _, r in rt_p.phase_rows for t in r}
    assert {"DEPOSIT", "SHTSOLVE", "SHT", "RAYPROP", "PARTIO"} <= tags

    # timing.0 gains per-phase columns in Profile mode
    rt_p.write_timing()
    lines = open(f"{cfg_p.OutputPath}/timing.0").read().splitlines()
    assert lines[0].startswith("# plane StepTime Deposit Shtsolve Sht Rayprop")
    ncol = len(lines[0].split()) - 1
    assert all(len(ln.split()) == ncol for ln in lines[1:])
    # the per-task summary file exists too (printProfileInfo analog)
    assert open(f"{cfg_p.OutputPath}/timing").read().strip()

    # non-profile mode keeps the old 2-column format
    rt_f.write_timing()
    lines_f = open(f"{cfg_f.OutputPath}/timing.0").read().splitlines()
    assert lines_f[0] == "# plane StepTime[s]"
