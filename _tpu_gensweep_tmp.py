import sys, time
import jax, jax.numpy as jnp, numpy as np
from furniture_tpu.config import EnvConfig, SimConfig
from furniture_tpu.envs.sawyer_gen import FurnitureSawyerGenEnv

log = open('/tmp/gensweep.log', 'a', buffering=1)
def p(*a): print(*a, file=log)

B = 16
H = 800
kw = {}
if len(sys.argv) > 1:
    kw = eval(sys.argv[1])  # e.g. "{'grip_torsion':0.5}"
env = FurnitureSawyerGenEnv(
    EnvConfig(agent_type='Sawyer', control_type='ik', sim=SimConfig(**kw))
)
p('=== sweep', kw, 'backend', jax.default_backend())
t0 = time.perf_counter()
states = jax.jit(env.reset_batch)(jax.random.split(jax.random.PRNGKey(0), B))
gens = jax.jit(jax.vmap(env.init_policy_state))(states, jax.random.split(jax.random.PRNGKey(1), B))

@jax.jit
def roll(states, gens):
    def body(carry, _):
        st, gn = carry
        a, gn = jax.vmap(env.scripted_action)(gn, st)
        st, obs, rew, done, info = env.step_batch(st, a)
        return (st, gn), (st.num_connected, gn.phase)
    (st, gn), (ncs, phases) = jax.lax.scan(body, (states, gens), None, length=H)
    return st, ncs, phases

st, ncs, phases = roll(states, gens)
ncs = np.asarray(ncs); phases = np.asarray(phases)
p('compile+run', round(time.perf_counter()-t0,1), 's')
p('final nc per seed:', ncs[-1])
p('max nc per seed:  ', ncs.max(axis=0))
p('success(>=4):', int((ncs[-1] >= 4).sum()), '/', B)
p('nc>=1:', int((ncs.max(axis=0) >= 1).sum()), 'nc>=2:', int((ncs.max(axis=0) >= 2).sum()))
p('final phase per seed:', phases[-1])
