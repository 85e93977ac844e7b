"""CLI flag parity: the reference README's exact invocations must parse."""

from ddpm_ood_tpu.config import (
    parse_args_ood_detection,
    parse_args_reconstruct,
    parse_args_train_ddpm,
    parse_args_train_vqvae,
)


def test_train_ddpm_readme_invocation():
    # reference README.md:61-71
    args = parse_args_train_ddpm([
        "--output_dir=/out", "--model_name=fashionmnist",
        "--training_ids=/d/FashionMNIST_train.csv",
        "--validation_ids=/d/FashionMNIST_val.csv",
        "--is_grayscale=1", "--n_epochs=300",
        "--beta_schedule=scaled_linear_beta",
        "--beta_start=0.0015", "--beta_end=0.0195",
    ])
    assert args.batch_size == 512  # reference default
    assert args.model_type == "small"
    assert args.prediction_type == "epsilon"
    assert args.checkpoint_every == 100
    assert args.eval_freq == 10
    assert args.b_scale == 1
    assert args.snr_shift == 1
    assert args.simplex_noise == 0


def test_train_ddpm_ldm_invocation():
    # reference README.md:167-190 (3D LDM with latent pad style tuple flags)
    args = parse_args_train_ddpm([
        "--output_dir=/out", "--model_name=ddpm_decathlon",
        "--vqvae_checkpoint=/out/vqvae_decathlon/checkpoint",
        "--training_ids=/d/t.csv", "--validation_ids=/d/v.csv",
        "--is_grayscale=1", "--n_epochs=12000", "--batch_size=6",
        "--eval_freq=25", "--checkpoint_every=1000", "--cache_data=0",
        "--prediction_type=epsilon", "--model_type=small",
        "--beta_schedule=scaled_linear_beta", "--beta_start=0.0015",
        "--beta_end=0.0195", "--b_scale=1.0", "--spatial_dimension=3",
        "--image_roi=[160,160,128]", "--image_size=128",
        "--latent_pad=(1,1,2,2,0,0)",
    ])
    assert args.image_roi == [160, 160, 128]
    assert args.latent_pad == (1, 1, 2, 2, 0, 0)
    assert args.spatial_dimension == 3


def test_train_vqvae_readme_invocation():
    # reference README.md:141-163
    args = parse_args_train_vqvae([
        "--output_dir=/out", "--model_name=vqvae_decathlon",
        "--training_ids=/d/t.csv", "--validation_ids=/d/v.csv",
        "--is_grayscale=1", "--n_epochs=300", "--batch_size=8",
        "--eval_freq=10", "--cache_data=0",
        "--vqvae_downsample_parameters=[[2,4,1,1],[2,4,1,1],[2,4,1,1],[2,4,1,1]]",
        "--vqvae_upsample_parameters=[[2,4,1,1,0],[2,4,1,1,0],[2,4,1,1,0],[2,4,1,1,0]]",
        "--vqvae_num_channels=[256,256,256,256]",
        "--vqvae_num_res_channels=[256,256,256,256]",
        "--vqvae_embedding_dim=128", "--vqvae_num_embeddings=2048",
        "--vqvae_decay=0.9", "--vqvae_learning_rate=3e-5",
        "--spatial_dimension=3", "--image_roi=[160,160,128]", "--image_size=128",
    ])
    assert args.vqvae_num_embeddings == 2048
    assert args.vqvae_downsample_parameters[0] == [2, 4, 1, 1]
    assert args.vqvae_ddp_sync is True  # accepted for parity
    assert args.adversarial_weight == 0.01


def test_reconstruct_readme_invocation():
    # reference README.md:97-113; eval_checkpoint aliases ddpm_checkpoint_epoch
    args = parse_args_reconstruct([
        "--output_dir=/out", "--model_name=fashionmnist",
        "--validation_ids=/d/val.csv", "--in_ids=/d/in.csv",
        "--out_ids=/d/MNIST_test.csv,/d/FashionMNIST_vflip_test.csv",
        "--is_grayscale=1", "--beta_schedule=scaled_linear_beta",
        "--beta_start=0.0015", "--beta_end=0.0195",
        "--num_inference_steps=100", "--inference_skip_factor=4",
        "--run_val=1", "--run_in=1", "--run_out=1",
        "--eval_checkpoint=250",
    ])
    assert args.inference_skip_factor == 4
    assert args.ddpm_checkpoint_epoch == "250"  # aliased
    assert args.sampler == "plms"  # extension default keeps parity
    assert args.first_n is None and args.first_n_val is None


def test_ood_detection_invocation():
    args = parse_args_ood_detection([
        "--output_dir=/out", "--model_name=fashionmnist,cifar10", "--max_t=500",
    ])
    assert args.model_name.split(",") == ["fashionmnist", "cifar10"]
    assert args.max_t == 500 and args.min_t == 0 and args.t_skip == 1
