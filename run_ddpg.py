"""DDPG (TD3+BC) training / evaluation.

Entry-point parity with `/root/reference/run_ddpg.py` (same flags and
defaults; weights saved as flax msgpack instead of torch .pt).

Usage: python run_ddpg.py --simcase two-stream --optimize --num_episode 500
"""

from plasma_control_tpu.cli import add_control_args, base_parser, build_control_config, build_sim_config
from plasma_control_tpu.cli_rl import run_rl
from plasma_control_tpu.control.rl.ddpg import DDPGConfig


def main():
    p = add_control_args(base_parser("RL-based optimal control: DDPG"), max_mode=3, coeff=1.25)
    # reference DDPG flags (`run_ddpg.py:59-88`)
    p.add_argument("--update_freq", type=int, default=10)
    p.add_argument("--mlp_dim", type=int, default=64)
    p.add_argument("--r", type=float, default=0.995)
    p.add_argument("--tau", type=float, default=0.005)
    p.add_argument("--capacity", type=int, default=100000)
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--num_episode", type=int, default=500)
    p.add_argument("--verbose", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--noise_scale", type=float, default=0.1)
    p.add_argument("--mu", type=float, default=0.0)
    p.add_argument("--theta", type=float, default=0.15)
    p.add_argument("--sigma", type=float, default=0.20)
    p.add_argument("--alpha", type=float, default=0.100)
    p.add_argument("--beta", type=float, default=0.100)
    p.add_argument("--min_buffer_size", type=int, default=10000)
    p.add_argument("--reward_shape", type=str, default="reference", choices=["reference", "shaped"],
                   help="training reward: reference parity, or the scale-free shaped variant")
    p.add_argument("--encoder", type=str, default="deepsets", choices=["deepsets", "spectral"],
                   help="actor/critic state encoder: the reference's DeepSets ParticleEncoder, "
                        "or spectral phase-space moments (DDPGConfig.encoder)")
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
    hp = DDPGConfig(
        mlp_dim=args["mlp_dim"],
        lr=args["lr"],
        gamma=args["r"],
        tau=args["tau"],
        capacity=args["capacity"],
        batch_size=args["batch_size"],
        update_freq=args["update_freq"],
        min_buffer_size=args["min_buffer_size"],
        num_episodes=args["num_episode"],
        noise_scale=args["noise_scale"],
        ou_mu=args["mu"],
        ou_theta=args["theta"],
        ou_sigma=args["sigma"],
        output_min=args["coeff_min"],
        output_max=args["coeff_max"],
        alpha=args["alpha"],
        beta=args["beta"],
        reward_shape=args["reward_shape"],
        encoder=args["encoder"],
    )
    run_rl("ddpg", args, cfg, ctrl, hp)


if __name__ == "__main__":
    main()
