"""Differentiable rendering utilities: losses, gradients, FD checks."""
