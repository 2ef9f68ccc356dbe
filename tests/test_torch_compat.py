"""Torch-checkpoint import parity: flax forward == torch forward.

Builds the reference architectures in torch (VAE.py:16-273 layer shapes),
copies weights through the converter, and checks encoder/decoder outputs
agree to float tolerance. This doubles as an architecture-parity test of
our flax models against the reference.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lvae_tpu.models import vae as mv  # noqa: E402
from lvae_tpu.utils.torch_compat import (  # noqa: E402
    convvae_params_from_torch,
    simplevae_params_from_torch,
)

LATENT = 6


class TorchConvVAE(torch.nn.Module):
    """Reference ConvVAE layer structure (VAE.py:44-77)."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(1, 16, 3, stride=1, padding=1)
        self.conv2 = torch.nn.Conv2d(16, 32, 3, stride=1, padding=1)
        self.fc1 = torch.nn.Linear(32 * 9 * 9, 300)
        self.fc21 = torch.nn.Linear(300, 30)
        self.fc211 = torch.nn.Linear(30, LATENT)
        self.fc221 = torch.nn.Linear(30, LATENT)
        self.fc3 = torch.nn.Linear(LATENT, 30)
        self.fc31 = torch.nn.Linear(30, 300)
        self.fc4 = torch.nn.Linear(300, 32 * 9 * 9)
        self.deconv1 = torch.nn.ConvTranspose2d(32, 16, 4, stride=2, padding=1)
        self.deconv2 = torch.nn.ConvTranspose2d(16, 1, 4, stride=2, padding=1)
        self._log_vy = torch.nn.Parameter(torch.randn(36 * 36) * 0.1)

    def encode(self, x):
        z = F.relu(self.conv1(x))
        z = F.max_pool2d(z, 2)
        z = F.relu(self.conv2(z))
        z = F.max_pool2d(z, 2)
        z = z.reshape(-1, 32 * 9 * 9)
        h1 = F.relu(self.fc1(z))
        h2 = F.relu(self.fc21(h1))
        return self.fc211(h2), self.fc221(h2)

    def decode(self, z):
        x = F.relu(self.fc3(z))
        x = F.relu(self.fc31(x))
        x = F.relu(self.fc4(x))
        x = x.reshape(-1, 32, 9, 9)
        x = F.relu(self.deconv1(x))
        return torch.sigmoid(self.deconv2(x))


class TorchSimpleVAE(torch.nn.Module):
    def __init__(self, num_dim=50):
        super().__init__()
        self.fc1 = torch.nn.Linear(num_dim, 300)
        self.fc21 = torch.nn.Linear(300, 30)
        self.fc211 = torch.nn.Linear(30, LATENT)
        self.fc221 = torch.nn.Linear(30, LATENT)
        self.fc3 = torch.nn.Linear(LATENT, 30)
        self.fc31 = torch.nn.Linear(30, 300)
        self.fc4 = torch.nn.Linear(300, num_dim)
        self._log_vy = torch.nn.Parameter(torch.randn(num_dim) * 0.1)

    def encode(self, x):
        h = F.relu(self.fc21(F.relu(self.fc1(x))))
        return self.fc211(h), self.fc221(h)

    def decode(self, z):
        return torch.sigmoid(self.fc4(F.relu(self.fc31(F.relu(self.fc3(z))))))


def test_convvae_torch_import_parity():
    torch.manual_seed(0)
    tmodel = TorchConvVAE().eval()
    params = convvae_params_from_torch(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}, LATENT
    )
    fmodel = mv.ConvVAE(latent_dim=LATENT, num_dim=36 * 36, p=0.0)

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(3, 36, 36, 1)).astype(np.float32)
    with torch.no_grad():
        tmu, tlv = tmodel.encode(torch.tensor(x.transpose(0, 3, 1, 2)))
    fmu, flv = fmodel.apply(
        params, jnp.asarray(x), deterministic=True, method=mv.ConvVAE.encode
    )
    np.testing.assert_allclose(np.asarray(fmu), tmu.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(flv), tlv.numpy(), atol=2e-5)

    z = rng.normal(size=(3, LATENT)).astype(np.float32)
    with torch.no_grad():
        trec = tmodel.decode(torch.tensor(z)).numpy()
    frec = fmodel.apply(
        params, jnp.asarray(z), deterministic=True, method=mv.ConvVAE.decode
    )
    np.testing.assert_allclose(
        np.asarray(frec).transpose(0, 3, 1, 2), trec, atol=2e-5
    )


def test_simplevae_torch_import_parity():
    torch.manual_seed(1)
    tmodel = TorchSimpleVAE().eval()
    params = simplevae_params_from_torch(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    )
    fmodel = mv.SimpleVAE(latent_dim=LATENT, num_dim=50)
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(4, 50)).astype(np.float32)
    with torch.no_grad():
        tmu, tlv = tmodel.encode(torch.tensor(x))
    fmu, flv = fmodel.apply(
        params, jnp.asarray(x), deterministic=True, method=mv.SimpleVAE.encode
    )
    np.testing.assert_allclose(np.asarray(fmu), tmu.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(flv), tlv.numpy(), atol=1e-5)


def test_torch_export_roundtrip(tmp_path):
    """flax → .pth → flax is the identity (export inverts the import maps),
    for both architectures."""
    import jax
    import jax.numpy as jnp

    from lvae_tpu.models.vae import ConvVAE, SimpleVAE
    from lvae_tpu.utils.torch_compat import (
        load_torch_vae_checkpoint,
        save_torch_vae_checkpoint,
    )

    conv = ConvVAE(latent_dim=5, num_dim=36 * 36, p=0.0)
    params = conv.init(
        jax.random.key(0), jnp.zeros((2, 36, 36, 1)), deterministic=True
    )
    path = str(tmp_path / "conv.pth")
    save_torch_vae_checkpoint(path, params, "conv")
    back = load_torch_vae_checkpoint(path, "conv", 5)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(back),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))

    simple = SimpleVAE(latent_dim=4, num_dim=20)
    params_s = simple.init(
        jax.random.key(1), jnp.zeros((2, 20)), deterministic=True
    )
    path_s = str(tmp_path / "simple.pth")
    save_torch_vae_checkpoint(path_s, params_s, "simple")
    back_s = load_torch_vae_checkpoint(path_s, "simple", 4)
    for a, b in zip(jax.tree.leaves(params_s), jax.tree.leaves(back_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
