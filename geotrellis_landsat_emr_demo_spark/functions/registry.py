"""Operation registry: name -> (index kernel, single ramp, diff ramp).

Mirrors the reference's request-time dispatch
``op match { case "ndvi" => NDVI.apply _; case "ndwi" => NDWI.apply _ }``
(server/src/main/scala/demo/Router.scala:78-82,140-144,279-291,316-328)
and the ramp pairing in Render.scala:88-99.
"""

from __future__ import annotations

from ..core import kernels

OPS = {
    "ndvi": dict(
        fn=kernels.ndvi, ramp=kernels.NDVI_RAMP, diff_ramp=kernels.NDVI_DIFF_RAMP
    ),
    "ndwi": dict(
        fn=kernels.ndwi, ramp=kernels.NDWI_RAMP, diff_ramp=kernels.NDWI_DIFF_RAMP
    ),
}


def get_op(name: str):
    if name not in OPS:
        raise ValueError(f"UNKNOWN OPERATION: {name!r}")  # Router.scala:82
    return OPS[name]
