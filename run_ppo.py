"""PPO training / evaluation.

Entry-point parity with `/root/reference/run_ppo.py` (same flags; note the
reference's dt default is 0.05 here, `run_ppo.py:39`).

Usage: python run_ppo.py --simcase two-stream --optimize --num_episode 200
"""

from plasma_control_tpu.cli import add_control_args, base_parser, build_control_config, build_sim_config
from plasma_control_tpu.cli_rl import run_rl
from plasma_control_tpu.control.rl.ppo import PPOConfig


def main():
    p = add_control_args(base_parser("RL-based optimal control: PPO"), max_mode=3, coeff=1.0)
    p.set_defaults(dt=0.05)  # `run_ppo.py:39`
    p.add_argument("--mlp_dim", type=int, default=32)
    p.add_argument("--r", type=float, default=0.995)
    p.add_argument("--std", type=float, default=0.5)
    p.add_argument("--capacity", type=int, default=8)
    p.add_argument("--eps_clip", type=float, default=0.25)
    p.add_argument("--entropy_coeff", type=float, default=0.01)
    p.add_argument("--value_coeff", type=float, default=0.20)
    p.add_argument("--num_episode", type=int, default=200)
    p.add_argument("--verbose", type=int, default=10)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--k_epoch", type=int, default=4)
    p.add_argument("--alpha", type=float, default=0.10)
    p.add_argument("--beta", type=float, default=0.00)
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
    hp = PPOConfig(
        mlp_dim=args["mlp_dim"],
        lr=args["lr"],
        gamma=args["r"],
        std_init=args["std"],
        chunk_size=args["capacity"],
        eps_clip=args["eps_clip"],
        entropy_coeff=args["entropy_coeff"],
        value_coeff=args["value_coeff"],
        k_epoch=args["k_epoch"],
        num_episodes=args["num_episode"],
        output_min=args["coeff_min"],
        output_max=args["coeff_max"],
        alpha=args["alpha"],
        beta=args["beta"],
        reward_shape=args["reward_shape"],
    )
    run_rl("ppo", args, cfg, ctrl, hp)


if __name__ == "__main__":
    main()
