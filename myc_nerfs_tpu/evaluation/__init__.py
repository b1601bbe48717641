"""Evaluation: pose alignment/error metrics, pose export, test-time optim."""
