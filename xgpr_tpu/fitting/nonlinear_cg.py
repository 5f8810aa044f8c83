"""Nonlinear (Polak-Ribiere) CG for softmax classification.

Parity: fitting_toolkit/nonlinear_cg_toolkit.py -- preconditioner as the H0
approximation, quadratic-interpolation + Armijo backtracking line search,
convergence on relative loss change.
"""
import numpy as np
import jax.numpy as jnp


class NonlinearCGClassification:
    """Fits multinomial-logistic weights on random features."""

    def __init__(self, engine, verbose=False, preconditioner=None):
        self.engine = engine
        self.kernel = engine.kernel
        self.lambda_ = self.kernel.get_lambda()
        self.verbose = verbose
        self.preconditioner = preconditioner
        self.n_iter = 0
        self.losses = []
        self.last_grad = None
        self.last_search_direction = None

    def cost_fun(self, wvec):
        grad, loss = self.engine.classification_loss_grad(wvec, self.lambda_)
        if self.verbose:
            print(f"        Func eval loss {loss}", flush=True)
        return grad, float(loss)

    def fit_model(self, n_classes, max_iter=500, tol=1e-4):
        wvec = jnp.zeros((self.kernel.get_num_rffs(), n_classes))
        self.n_iter = 0
        grad, loss = self.cost_fun(wvec)
        self.losses = [loss]
        last_alpha = None
        if self.verbose:
            print(f"Starting loss: {loss}")

        while self.n_iter < max_iter:
            grad, loss, wvec, _ = self._update_params(grad, wvec, loss,
                                                      last_alpha, tol)
            self.losses.append(loss)
            if self.verbose:
                print(f"Niter {self.n_iter}, loss {loss}", flush=True)
            if abs(abs(self.losses[-1] - self.losses[-2])
                   / self.losses[-2]) < tol:
                break
            self.n_iter += 1
            last_alpha = self.losses[self.n_iter - 1]

        return wvec, self.n_iter, self.losses

    def _update_params(self, grad, wvec, loss, previous_loss, tol):
        if self.preconditioner is not None:
            search_direction = self.preconditioner.batch_matvec(grad)
        else:
            search_direction = grad

        if self.last_grad is not None:
            polak_ribiere = float(jnp.sum(search_direction *
                                          (grad - self.last_grad)))
            polak_ribiere /= float(jnp.sum(self.last_grad *
                                           self.last_search_direction))
            polak_ribiere = max(0.0, polak_ribiere)
            course_correction = polak_ribiere * self.last_search_direction
            self.last_grad = grad
            self.last_search_direction = search_direction
            search_direction = search_direction + course_correction
        else:
            self.last_grad = grad
            self.last_search_direction = search_direction

        search_direction = -search_direction
        alpha0_prime = float(jnp.sum(grad * search_direction))

        if previous_loss is None:
            alpha_init = 1.0
        else:
            alpha_init = 2 * (loss - previous_loss) / alpha0_prime

        new_wvec = wvec + alpha_init * search_direction
        full_step_grad, full_step_loss = self.cost_fun(new_wvec)

        # Late iterations: accept the interpolated guess directly if it
        # satisfies Armijo and would not spuriously trigger convergence.
        if self.n_iter >= 10:
            if abs(abs(full_step_loss - loss) / loss) > tol:
                if full_step_loss < (loss + alpha_init * 1e-4
                                     * alpha0_prime):
                    return full_step_grad, full_step_loss, new_wvec, \
                        alpha_init

        denom = 2 * (full_step_loss - loss - alpha0_prime * alpha_init)
        alpha_quad = -(alpha0_prime * alpha_init ** 2) / denom
        quad_wvec = wvec + alpha_quad * search_direction
        quad_grad, quad_loss = self.cost_fun(quad_wvec)

        if quad_loss < full_step_loss:
            if quad_loss < (loss + alpha_quad * 1e-4 * alpha0_prime):
                return quad_grad, quad_loss, quad_wvec, alpha_quad
        elif full_step_loss < (loss + alpha_init * 1e-4 * alpha0_prime):
            return full_step_grad, full_step_loss, new_wvec, alpha_init

        losses = [loss, full_step_loss, quad_loss]
        grads = [grad, full_step_grad, quad_grad]
        wvecs = [wvec, new_wvec, quad_wvec]
        alphas = [0, alpha_init, alpha_quad]

        alpha_max = alpha_quad if quad_loss < full_step_loss else alpha_init
        rfactor = 0.5
        for _ in range(10):
            alpha = rfactor * alpha_max
            candidate_wvec = wvec + alpha * search_direction
            candidate_grad, candidate_loss = self.cost_fun(candidate_wvec)
            if candidate_loss < (loss + alpha * 1e-4 * alpha0_prime):
                return candidate_grad, candidate_loss, candidate_wvec, alpha
            losses.append(candidate_loss)
            grads.append(candidate_grad)
            wvecs.append(candidate_wvec)
            alphas.append(alpha)
            rfactor *= 0.5

        best_idx = int(np.argmin(losses))
        return (grads[best_idx], losses[best_idx], wvecs[best_idx],
                alphas[best_idx])
