"""L4 attackers + benchmark orchestration."""

from spaa_tpu.attack.spaa import (SpaaConfig, spaa, spaa_attack_batched,
                                  stealth_weights)
from spaa_tpu.attack.perc_al import PerC_AL, PercALConfig, quantization
from spaa_tpu.attack.one_pixel import (BatchedDE, DigitalOnePixelAttacker,
                                       ProjectorOnePixelAttacker,
                                       perturb_image_np)
from spaa_tpu.attack.orchestrate import (ATTACKER_NAMES, get_attacker_cfg,
                                         perc_al_compennet_pp,
                                         project_capture_real_attack,
                                         run_projector_based_attack,
                                         to_attacker_cfg_str)
from spaa_tpu.attack.summarize import (attack_results,
                                       summarize_all_attackers,
                                       summarize_single_attacker)

__all__ = [
    "SpaaConfig", "spaa", "spaa_attack_batched", "stealth_weights",
    "PerC_AL", "PercALConfig", "quantization", "BatchedDE",
    "DigitalOnePixelAttacker", "ProjectorOnePixelAttacker",
    "perturb_image_np", "ATTACKER_NAMES", "get_attacker_cfg",
    "perc_al_compennet_pp", "project_capture_real_attack",
    "run_projector_based_attack", "to_attacker_cfg_str", "attack_results",
    "summarize_all_attackers", "summarize_single_attacker",
]
