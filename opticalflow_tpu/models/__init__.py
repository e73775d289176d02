"""Model zoo: PWC-DC optical-flow networks (current + legacy variants)."""
from opticalflow_tpu.models.pwcnet import PWCDCNet, pwc_dc_net, pwc_dc_net_old

__all__ = ["PWCDCNet", "pwc_dc_net", "pwc_dc_net_old"]
