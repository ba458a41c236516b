"""Equations of state.

Vectorised JAX counterparts of the reference EOS modules
(eos.F90, eos_w.F90, eos_we.F90, ...). Region-dependent behaviour is
branchless (masked) so everything jits and differentiates; regions only
change in the explicit transition pass, mirroring the reference's
freeze-region-during-Jacobian behaviour (doc/dev/code/index.md:37-39).
"""

from waiwera_tpu.eos.base import EOS


def from_json(config: dict, thermo, relperm, capillarity, logger=None) -> EOS:
    """EOS selection from the JSON 'eos.name' value
    (reference: eos_setup.F90)."""
    spec = config.get("eos", {})
    if isinstance(spec, str):
        name = spec
        spec = {"name": name}
    name = spec.get("name", "we").lower()
    if name == "w":
        from waiwera_tpu.eos.w import EOSWater

        return EOSWater(config, thermo, relperm, capillarity)
    if name == "we":
        from waiwera_tpu.eos.we import EOSWaterEnergy

        return EOSWaterEnergy(config, thermo, relperm, capillarity)
    if name in ("wge", "wae", "wce"):
        from waiwera_tpu.eos.wge import EOSWaterGasEnergy

        return EOSWaterGasEnergy(config, thermo, relperm, capillarity, name)
    if name == "wse":
        from waiwera_tpu.eos.wse import EOSWaterSaltEnergy

        return EOSWaterSaltEnergy(config, thermo, relperm, capillarity)
    if name in ("wsge", "wsae", "wsce"):
        from waiwera_tpu.eos.wsge import EOSWaterSaltGasEnergy

        return EOSWaterSaltGasEnergy(
            config, thermo, relperm, capillarity, name
        )
    raise ValueError(f"unknown EOS: {name!r}")
