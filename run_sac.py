"""SAC training / evaluation.

Entry-point parity with `/root/reference/run_sac.py` (same flags; note its
bigger defaults N=10000, N_mesh=500, max_mode=5, `run_sac.py:33-35,57`).

Usage: python run_sac.py --simcase bump-on-tail --optimize --num_episode 1000
"""

from plasma_control_tpu.cli import add_control_args, base_parser, build_control_config, build_sim_config
from plasma_control_tpu.cli_rl import run_rl
from plasma_control_tpu.control.rl.sac import SACConfig


def main():
    p = add_control_args(base_parser("RL-based optimal control: SAC"), max_mode=5, coeff=1.0)
    p.set_defaults(num_particle=10000, num_mesh=500)  # `run_sac.py:33-35`
    p.add_argument("--mlp_dim", type=int, default=32)
    p.add_argument("--r", type=float, default=0.995)
    p.add_argument("--tau", type=float, default=0.5)
    p.add_argument("--capacity", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--num_episode", type=int, default=1000)
    p.add_argument("--verbose", type=int, default=10)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--reward_shape", type=str, default="reference", choices=["reference", "shaped"],
                   help="training reward: reference parity, or the scale-free shaped variant")
    p.add_argument("--save_last", type=str, default=None)
    p.add_argument("--save_best", type=str, default=None)
    p.add_argument("--optimize", action="store_true", default=False)
    p.add_argument("--checkpoint_every", type=int, default=0,
                   help="episodes between full training-state checkpoints (0 = off)")
    p.add_argument("--checkpoint_path", type=str, default=None)
    p.add_argument("--no_resume", action="store_true", help="ignore an existing training checkpoint")
    args = vars(p.parse_args())

    cfg = build_sim_config(args)
    ctrl = build_control_config(args)
    hp = SACConfig(
        mlp_dim=args["mlp_dim"],
        lr=args["lr"],
        gamma=args["r"],
        tau=args["tau"],
        capacity=args["capacity"],
        batch_size=args["batch_size"],
        num_episodes=args["num_episode"],
        output_min=args["coeff_min"],
        output_max=args["coeff_max"],
        alpha=args["alpha"],
        reward_shape=args["reward_shape"],
    )
    run_rl("sac", args, cfg, ctrl, hp)


if __name__ == "__main__":
    main()
