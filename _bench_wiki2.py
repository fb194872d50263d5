import time, sys, numpy as np, jax, jax.numpy as jnp, optax
t00=time.perf_counter()
def lap(msg): print(round(time.perf_counter()-t00,1), msg, flush=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from besskge_tpu.batch_sampler import RandomShardedBatchSampler
from besskge_tpu.bess import EmbeddingMovingBessKGE
from besskge_tpu.dataset import KGDataset
from besskge_tpu.loss import SampledSoftmaxCrossEntropyLoss
from besskge_tpu.negative_sampler import RandomShardedNegativeSampler
from besskge_tpu.scoring import TransE
from besskge_tpu.sharding import PartitionedTripleSet, Sharding
from besskge_tpu.trainer import build_train_step, init_optimizer_state
from besskge_tpu.optim import RowSGDM
lap("imports")
mode = sys.argv[1] if len(sys.argv)>1 else "sparse"
N=2_500_604; T=100_000; BPS=8; SHARD_BS=512; D=128
rng=np.random.default_rng(0)
triples=np.stack([rng.integers(N,size=T),rng.integers(535,size=T),rng.integers(N,size=T)],1).astype(np.int32)
ds=KGDataset(n_entity=N,n_relation_type=535,entity_dict=None,relation_dict=None,type_offsets=None,triples={"train":triples},original_triple_ids={"train":np.arange(T)},neg_heads=None,neg_tails=None)
sh=Sharding.create(N,1,seed=0)
pts=PartitionedTripleSet.create_from_dataset(ds,"train",sh)
lap("data")
sf=TransE(negative_sample_sharing=True,scoring_norm=1,sharding=sh,n_relation_type=535,embedding_size=D,seed=0)
params=sf.initial_params_device()
jax.block_until_ready(params["entity_embedding"])
lap("device table init")
ns=RandomShardedNegativeSampler(32,sh,0,"ht",local_sampling=False,flat_negative_format=True)
bs=RandomShardedBatchSampler(pts,ns,shard_bs=SHARD_BS,batches_per_step=BPS,seed=0)
bess=EmbeddingMovingBessKGE(negative_sampler=ns,score_fn=sf,
    loss_fn=SampledSoftmaxCrossEntropyLoss(n_entity=N), augment_negative=True, axis_name=None)
opt=optax.sgd(1e-3, momentum=0.9)
if mode=="sparse":
    row=RowSGDM(learning_rate=1e-3, momentum=0.9)
    st=init_optimizer_state(opt,params,None,row)
    step=build_train_step(bess,opt,None,row)
else:
    st=init_optimizer_state(opt,params,None)
    step=build_train_step(bess,opt,None)
lap("opt state")
b={k:jnp.asarray(v) for k,v in bs.sample_batch([0]).items()}
lap("batch")
params,st,out=step(params,st,b); l=float(out["loss"])
lap("compile+first step, loss %.2f" % l)
for n_steps in (30, 60):
    t=time.perf_counter()
    for i in range(n_steps):
        params,st,out=step(params,st,b)
    lv=float(out["loss"]); dt=time.perf_counter()-t
    print(mode, n_steps, "steps", round(dt,4), "s ->", round(n_steps*BPS*SHARD_BS/dt/1e6,3), "M pos triples/s", flush=True)
