from gpz_tpu.ops.vc_phi import vc_lnphi_complete, pallas_enabled

__all__ = ["vc_lnphi_complete", "pallas_enabled"]
