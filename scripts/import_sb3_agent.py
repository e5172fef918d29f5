"""Import a reference SB3 PPO checkpoint (.zip) to a train-CLI .npz.

    python scripts/import_sb3_agent.py \
        /root/reference/ppo_agents/PFCA_see_3_obs_19_90.zip \
        --out artifacts/imported/agent_19_90.npz [--verify]

Thin wrapper around the packaged CLI (`drone2d-import-sb3`, i.e.
drone2d_tpu.compat.sb3_import:main).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from drone2d_tpu.compat.sb3_import import main

if __name__ == "__main__":
    main()
