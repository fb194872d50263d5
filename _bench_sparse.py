import time, json, numpy as np, jax, jax.numpy as jnp, optax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from besskge_tpu.batch_sampler import RandomShardedBatchSampler
from besskge_tpu.bess import EmbeddingMovingBessKGE
from besskge_tpu.dataset import KGDataset
from besskge_tpu.loss import LogSigmoidLoss
from besskge_tpu.negative_sampler import RandomShardedNegativeSampler
from besskge_tpu.scoring import RotatE
from besskge_tpu.sharding import PartitionedTripleSet, Sharding
from besskge_tpu.trainer import build_train_step, init_optimizer_state
from besskge_tpu.optim import RowAdamW

N=93773; T=1_000_000; BPS=48; SHARD_BS=240
rng=np.random.default_rng(0)
triples=np.stack([rng.integers(N,size=T),rng.integers(51,size=T),rng.integers(N,size=T)],1).astype(np.int32)
ds=KGDataset(n_entity=N,n_relation_type=51,entity_dict=None,relation_dict=None,type_offsets=None,triples={"train":triples},original_triple_ids={"train":np.arange(T)},neg_heads=None,neg_tails=None)
sh=Sharding.create(N,1,seed=0)
pts=PartitionedTripleSet.create_from_dataset(ds,"train",sh)
sf=RotatE(negative_sample_sharing=True,scoring_norm=2,sharding=sh,n_relation_type=51,embedding_size=64,seed=0)
ns=RandomShardedNegativeSampler(1,sh,0,"ht",local_sampling=False,flat_negative_format=True)
bs=RandomShardedBatchSampler(pts,ns,shard_bs=SHARD_BS,batches_per_step=BPS,seed=0)
bess=EmbeddingMovingBessKGE(negative_sampler=ns,score_fn=sf,loss_fn=LogSigmoidLoss(margin=12.0,negative_adversarial_sampling=True),axis_name=None)
opt=optax.adamw(1e-3)
row=RowAdamW(learning_rate=1e-3)
params={k:jax.device_put(jnp.asarray(v)) for k,v in sf.initial_params().items()}
st=init_optimizer_state(opt,params,None,row)
step=build_train_step(bess,opt,None,row)
b={k:jnp.asarray(v) for k,v in bs.sample_batch([0]).items()}
params,st,out=step(params,st,b); l=float(out["loss"])
for n_steps in (60, 120, 240):
    t=time.perf_counter()
    for i in range(n_steps):
        params,st,out=step(params,st,b)
    lv=float(out["loss"]); dt=time.perf_counter()-t
    print("sparse", n_steps, "steps", round(dt,4), "s ->", round(n_steps*BPS*SHARD_BS/dt/1e6,2), "M triples/s")
